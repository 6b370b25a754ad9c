"""Standalone `make test-rx` helper: modulate 3 BERT frames, pipe into
opv-modem RX mode, count the UDP frames delivered (reference Makefile:53-72)."""

import socket
import subprocess
import sys

PORT = 57399


def main():
    mod = subprocess.run(
        [sys.executable, "-m", "opv_tpu.cli.opv_mod", "-S", "TEST", "-B", "3"],
        capture_output=True, check=True)
    listener = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    listener.bind(("127.0.0.1", PORT))
    listener.settimeout(120)
    proc = subprocess.Popen(
        [sys.executable, "-m", "opv_tpu.cli.opv_modem", "-R", "-r", str(PORT), "-q"],
        stdin=subprocess.PIPE, stderr=subprocess.DEVNULL)
    proc.stdin.write(mod.stdout)
    proc.stdin.close()
    got = 0
    try:
        for _ in range(3):
            listener.recvfrom(4096)
            got += 1
    except socket.timeout:
        pass
    proc.terminate()
    print(f"{got}/3 frames received")
    return 0 if got == 3 else 1


if __name__ == "__main__":
    sys.exit(main())
