"""Deployment-script tests (C22-C24) with stubbed libiio tools.

No PlutoSDR exists in CI, so the iio_* utilities are replaced by stubs:
iio_readdev emits a golden capture, iio_writedev counts bytes, iio_attr and
iio_info accept anything.  This exercises the scripts' real wiring — radio
config calls, pipeline plumbing, flag parsing — end to end.
"""

import os
import pathlib
import socket
import stat
import subprocess
import time

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture()
def iio_stubs(tmp_path, golden_dir):
    b = tmp_path / "bin"
    b.mkdir()

    def stub(name, body):
        f = b / name
        f.write_text("#!/bin/bash\n" + body)
        f.chmod(f.stat().st_mode | stat.S_IEXEC)

    stub("iio_info", "exit 0\n")
    stub("iio_attr", f'echo "$@" >> {tmp_path}/attr.log\nexit 0\n')
    stub("iio_readdev", f'cat "{golden_dir}/bert3.iq"\n')
    stub("iio_writedev", f"wc -c > {tmp_path}/tx_bytes\n")
    env = {**os.environ, "PATH": f"{b}:{os.environ['PATH']}",
           "JAX_PLATFORMS": "cpu"}
    return env, tmp_path


class TestPlutoRx:
    def test_rx_script_decodes_golden(self, iio_stubs):
        env, tmp = iio_stubs
        r = subprocess.run(
            ["bash", str(REPO / "scripts" / "opv-pluto-rx.sh")],
            env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-500:]
        # stderr carries the demod summary
        assert "Summary: 3 frames (3 perfect, 0 errors)" in r.stderr
        # the radio got configured (frequency + sampling rate attrs)
        attrs = (tmp / "attr.log").read_text()
        assert "altvoltage0 frequency 435000000" in attrs
        assert "sampling_frequency 2168000" in attrs

    def test_rx_script_capture_tee(self, iio_stubs, golden_dir):
        env, tmp = iio_stubs
        cap = tmp / "cap.iq"
        r = subprocess.run(
            ["bash", str(REPO / "scripts" / "opv-pluto-rx.sh"),
             "-q", "-c", str(cap)],
            env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-500:]
        assert cap.read_bytes() == (golden_dir / "bert3.iq").read_bytes()


class TestPlutoTx:
    def test_tx_script_transmits_bert(self, iio_stubs):
        env, tmp = iio_stubs
        r = subprocess.run(
            ["bash", str(REPO / "scripts" / "opv-pluto-tx.sh"),
             "-S", "W5NYV", "-B", "2"],
            env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-500:]
        # 2 frames + 100-symbol flush of int16 IQ reached the radio
        n = int((tmp / "tx_bytes").read_text().split()[0])
        assert n == (2 * 86720 + 100 * 40) * 4
        attrs = (tmp / "attr.log").read_text()
        assert "altvoltage1 frequency 435000000" in attrs

    def test_tx_script_requires_callsign(self, iio_stubs):
        env, _ = iio_stubs
        r = subprocess.run(
            ["bash", str(REPO / "scripts" / "opv-pluto-tx.sh")],
            env=env, capture_output=True, text=True, timeout=120)
        assert r.returncode != 0
        assert "CALLSIGN" in r.stderr + r.stdout


class TestPlutoFullDuplex:
    def test_full_duplex_both_directions(self, iio_stubs, golden_dir):
        """C22: opv-pluto.sh runs TX and RX concurrently — golden IQ from
        the stubbed radio reaches Interlocutor as UDP frames WHILE a UDP
        frame pushed the other way reaches the stubbed radio as IQ."""
        env, tmp = iio_stubs
        b = tmp / "bin"
        done = tmp / "done"
        # full-duplex variants of the stubs: the RX stream stays open until
        # the test confirms both directions, so the script keeps running
        (b / "iio_readdev").write_text(
            "#!/bin/bash\n"
            f'cat "{golden_dir}/bert3.iq"\n'
            f'while [ ! -f "{done}" ]; do sleep 0.5; done\n')
        (b / "iio_writedev").write_text(
            "#!/bin/bash\n"
            f'exec dd of="{tmp}/tx.bin" status=none bs=4096\n')

        tx_port, rx_port = 57512, 57513
        listener = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        listener.bind(("127.0.0.1", rx_port))
        listener.settimeout(1.0)
        proc = subprocess.Popen(
            ["bash", str(REPO / "scripts" / "opv-pluto.sh"),
             "--tx-port", str(tx_port), "--rx-port", str(rx_port)],
            env=env, stderr=subprocess.PIPE, stdout=subprocess.DEVNULL)
        tx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        from opv_tpu.core.base40 import base40_encode
        frame = bytearray(134)
        frame[:6] = base40_encode("W5NYV")
        frame = bytes(frame)
        rx_frames = []
        tx_bin = tmp / "tx.bin"
        try:
            deadline = time.time() + 480
            while time.time() < deadline:
                # keep offering a TX frame until the modem is up and IQ flows
                if not (tx_bin.exists() and tx_bin.stat().st_size > 0):
                    tx_sock.sendto(frame, ("127.0.0.1", tx_port))
                try:
                    data, _ = listener.recvfrom(4096)
                    rx_frames.append(data)
                except socket.timeout:
                    pass
                # frame 3 sits in the streaming tail until EOF, so once the
                # mid-stream frames and the TX bytes are confirmed, end the
                # RX stream and collect the flush
                if (len(rx_frames) >= 2 and tx_bin.exists()
                        and tx_bin.stat().st_size > 0):
                    break
                if proc.poll() is not None:
                    break
            done.touch()
            drain = time.time() + 120
            while len(rx_frames) < 3 and time.time() < drain:
                try:
                    data, _ = listener.recvfrom(4096)
                    rx_frames.append(data)
                except socket.timeout:
                    pass
            proc.wait(timeout=60)
        finally:
            done.touch()
            if proc.poll() is None:
                proc.terminate()
                proc.wait(timeout=30)
            listener.close()
            tx_sock.close()
        # RX direction: the golden capture decoded to 3 W5NYV frames
        assert len(rx_frames) >= 3
        from opv_tpu.core.base40 import base40_decode
        for g in rx_frames[:3]:
            assert len(g) == 134
            assert base40_decode(g[:6]) == "W5NYV"
        # TX direction: at least one frame of int16 IQ reached the radio
        assert tx_bin.stat().st_size >= 4096
