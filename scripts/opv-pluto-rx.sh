#!/bin/bash
# opv-pluto-rx.sh — standalone OPV receiver: PlutoSDR -> opv-demod.
# Functional equivalent of the reference's scripts/opv-pluto-rx.sh (C23).
#
#   iio_readdev [-s N] | [tee capture.iq] | opv-demod -s [-o HZ]

set -euo pipefail

PLUTO_URI="${PLUTO_URI:-ip:192.168.2.1}"
RX_FREQ=435000000
SAMPLE_RATE=2168000
RX_GAIN=40
BUFFER_SIZE=346880
DURATION=0                 # seconds; 0 = continuous
CAPTURE_FILE=""
INIT_OFFSET=""
QUIET=""
OPV_DEMOD="${OPV_DEMOD:-python3 -m opv_tpu.cli.opv_demod}"

usage() {
    cat <<EOF
Usage: $(basename "$0") [OPTIONS]
  -f, --frequency HZ    RX frequency (default 435 MHz)
  -g, --gain DB         RX gain (default $RX_GAIN)
  -u, --uri URI         PlutoSDR URI (default $PLUTO_URI)
  -d, --duration SEC    capture duration (default: continuous)
  -c, --capture FILE    tee raw IQ to FILE
  -o, --offset HZ       initial frequency offset for the demod
  -q, --quiet           quiet demod output
  -h, --help            this help
EOF
    exit "${1:-0}"
}

while [[ $# -gt 0 ]]; do
    case "$1" in
        -f|--frequency) RX_FREQ="$2"; shift 2 ;;
        -g|--gain) RX_GAIN="$2"; shift 2 ;;
        -u|--uri) PLUTO_URI="$2"; shift 2 ;;
        -d|--duration) DURATION="$2"; shift 2 ;;
        -c|--capture) CAPTURE_FILE="$2"; shift 2 ;;
        -o|--offset) INIT_OFFSET="$2"; shift 2 ;;
        -q|--quiet) QUIET="-q"; shift ;;
        -h|--help) usage ;;
        *) echo "Unknown option: $1" >&2; usage 1 ;;
    esac
done

command -v iio_readdev >/dev/null || { echo "Error: iio_readdev not found" >&2; exit 1; }
iio_info -u "$PLUTO_URI" >/dev/null 2>&1 || { echo "Error: cannot reach PlutoSDR at $PLUTO_URI" >&2; exit 1; }

echo "Configuring AD9361 RX: $RX_FREQ Hz @ $SAMPLE_RATE SPS, gain $RX_GAIN dB" >&2
iio_attr -u "$PLUTO_URI" -c ad9361-phy altvoltage0 frequency "$RX_FREQ" >/dev/null
iio_attr -u "$PLUTO_URI" -c ad9361-phy voltage0 sampling_frequency "$SAMPLE_RATE" >/dev/null
iio_attr -u "$PLUTO_URI" -c ad9361-phy voltage0 rf_bandwidth "$SAMPLE_RATE" >/dev/null
iio_attr -u "$PLUTO_URI" -c -i ad9361-phy voltage0 gain_control_mode manual >/dev/null
iio_attr -u "$PLUTO_URI" -c -i ad9361-phy voltage0 hardwaregain "$RX_GAIN" >/dev/null

READ_ARGS=(-u "$PLUTO_URI" -b "$BUFFER_SIZE")
if [[ "$DURATION" != 0 ]]; then
    READ_ARGS+=(-s $((DURATION * SAMPLE_RATE)))
fi
DEMOD_ARGS=(-s $QUIET)
[[ -n "$INIT_OFFSET" ]] && DEMOD_ARGS+=(-o "$INIT_OFFSET")

if [[ -n "$CAPTURE_FILE" ]]; then
    iio_readdev "${READ_ARGS[@]}" cf-ad9361-lpc voltage0 voltage1 | \
        tee "$CAPTURE_FILE" | $OPV_DEMOD "${DEMOD_ARGS[@]}"
else
    iio_readdev "${READ_ARGS[@]}" cf-ad9361-lpc voltage0 voltage1 | \
        $OPV_DEMOD "${DEMOD_ARGS[@]}"
fi
