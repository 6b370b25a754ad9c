"""Deployment-script tests (C22-C24) with stubbed libiio tools.

No PlutoSDR exists in CI, so the iio_* utilities are replaced by stubs:
iio_readdev emits a golden capture, iio_writedev counts bytes, iio_attr and
iio_info accept anything.  This exercises the scripts' real wiring — radio
config calls, pipeline plumbing, flag parsing — end to end.
"""

import os
import pathlib
import stat
import subprocess

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
