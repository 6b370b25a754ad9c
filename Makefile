# opv_tpu — convenience targets mirroring the reference Makefile's test
# workflow (reference Makefile:22-74) against the Python CLIs.

PY ?= python
MOD   = $(PY) -m opv_tpu.cli.opv_mod
DEMOD = $(PY) -m opv_tpu.cli.opv_demod
MODEM = $(PY) -m opv_tpu.cli.opv_modem

.PHONY: all install native test test-raw test-server test-server-send test-rx pytest bench

all: install

install:
	pip install -e . --no-build-isolation -q

# build the C runtime extensions in place (_iqio sample I/O, _tracking
# symbol loop); everything degrades gracefully to pure JAX without them
native:
	$(PY) setup.py build_ext --inplace

# make test — BERT pipe loopback (reference Makefile:23-25)
test:
	$(MOD) -S W5NYV -B 5 | $(DEMOD) -s 2>&1 | grep -E "Station|Token|Summary"

# make test-raw — bit-exact raw round trip (reference Makefile:28-33)
test-raw:
	$(PY) -c "import random; random.seed(0xC0FFEE); \
	import sys; sys.stdout.buffer.write(bytes(random.randrange(256) for _ in range(3*134)))" > /tmp/opv_test_frames.bin
	$(MOD) -R < /tmp/opv_test_frames.bin | $(DEMOD) -s -r -q > /tmp/opv_test_out.bin
	cmp /tmp/opv_test_frames.bin /tmp/opv_test_out.bin && echo "RAW ROUND TRIP OK"

# make test-server — loopback UDP server (reference Makefile:36-43)
test-server:
	$(MODEM) -l

# make test-server-send — send one frame to a running test-server
test-server-send:
	$(PY) -c "import socket; \
	from opv_tpu.core.base40 import base40_encode; \
	f = bytearray(134); f[:6] = base40_encode('W5NYV'); f[6:9] = bytes([0xBB,0xAA,0xDD]); \
	s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM); \
	s.sendto(bytes(f), ('127.0.0.1', 57372)); s.sendto(bytes(f), ('127.0.0.1', 57372)); \
	s.settimeout(10); d, _ = s.recvfrom(4096); \
	print('MATCH' if d == bytes(f) else 'MISMATCH')"

# make test-rx — RX mode UDP delivery (reference Makefile:53-72)
test-rx:
	$(PY) tests/helpers/test_rx_helper.py

pytest:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py
