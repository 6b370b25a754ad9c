#!/bin/bash
# opv-pluto-tx.sh — standalone OPV transmitter: opv-mod -> PlutoSDR.
# Functional equivalent of the reference's scripts/opv-pluto-tx.sh (C24).
#
#   opv-mod -S CALL [-B N [-c]] | iio_writedev

set -euo pipefail

PLUTO_URI="${PLUTO_URI:-ip:192.168.2.1}"
TX_FREQ=435000000
SAMPLE_RATE=2168000
TX_GAIN=-20
BUFFER_SIZE=346880
CALLSIGN=""
BERT_FRAMES=10
CONTINUOUS=""
OPV_MOD="${OPV_MOD:-python3 -m opv_tpu.cli.opv_mod}"

usage() {
    cat <<EOF
Usage: $(basename "$0") -S CALLSIGN [OPTIONS]
  -S, --callsign CALL   station callsign (required)
  -B, --bert N          number of BERT frames (default $BERT_FRAMES)
  -c, --continuous      loop BERT forever
  -f, --frequency HZ    TX frequency (default 435 MHz)
  -g, --gain DB         TX gain (default $TX_GAIN)
  -u, --uri URI         PlutoSDR URI (default $PLUTO_URI)
  -h, --help            this help
EOF
    exit "${1:-0}"
}

while [[ $# -gt 0 ]]; do
    case "$1" in
        -S|--callsign) CALLSIGN="$2"; shift 2 ;;
        -B|--bert) BERT_FRAMES="$2"; shift 2 ;;
        -c|--continuous) CONTINUOUS="-c"; shift ;;
        -f|--frequency) TX_FREQ="$2"; shift 2 ;;
        -g|--gain) TX_GAIN="$2"; shift 2 ;;
        -u|--uri) PLUTO_URI="$2"; shift 2 ;;
        -h|--help) usage ;;
        *) echo "Unknown option: $1" >&2; usage 1 ;;
    esac
done

[[ -n "$CALLSIGN" ]] || { echo "Error: -S CALLSIGN required" >&2; usage 1; }
command -v iio_writedev >/dev/null || { echo "Error: iio_writedev not found" >&2; exit 1; }
iio_info -u "$PLUTO_URI" >/dev/null 2>&1 || { echo "Error: cannot reach PlutoSDR at $PLUTO_URI" >&2; exit 1; }

echo "Configuring AD9361 TX: $TX_FREQ Hz @ $SAMPLE_RATE SPS, gain $TX_GAIN dB" >&2
iio_attr -u "$PLUTO_URI" -c ad9361-phy altvoltage1 frequency "$TX_FREQ" >/dev/null
iio_attr -u "$PLUTO_URI" -c ad9361-phy voltage0 sampling_frequency "$SAMPLE_RATE" >/dev/null
iio_attr -u "$PLUTO_URI" -c ad9361-phy voltage0 rf_bandwidth "$SAMPLE_RATE" >/dev/null
iio_attr -u "$PLUTO_URI" -c -o ad9361-phy voltage0 hardwaregain "$TX_GAIN" >/dev/null
iio_attr -u "$PLUTO_URI" -c cf-ad9361-dds-core-lpc altvoltage0 raw 0 >/dev/null 2>&1 || true

echo "Transmitting $BERT_FRAMES BERT frames as $CALLSIGN..." >&2
$OPV_MOD -S "$CALLSIGN" -B "$BERT_FRAMES" $CONTINUOUS | \
    iio_writedev -u "$PLUTO_URI" -b "$BUFFER_SIZE" cf-ad9361-dds-core-lpc
