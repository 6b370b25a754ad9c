"""TX multiplexer tests: COBS framing, priority policy, abort/re-queue, and
the frame state machine (reference design docs/OPV multiplexing.md — the
reference never implemented it; these tests define the contract)."""

import numpy as np

from opv_tpu.config import CONFIG
from opv_tpu.tx.multiplexer import (
    DATA_BYTES, TxMultiplexer, TxState, cobs_decode, cobs_encode,
)


class TestCOBS:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        for n in (0, 1, 10, 253, 254, 255, 600, 1500):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            assert cobs_decode(cobs_encode(data)) == data

    def test_no_interior_zeros(self):
        data = bytes(range(256)) * 3
        enc = cobs_encode(data)
        assert 0 not in enc[:-1] and enc[-1] == 0


def mux(**kw):
    return TxMultiplexer("W5NYV", **kw)


class TestPriorities:
    def test_idle_no_output(self):
        m = mux()
        assert m.tick() == (TxState.IDLE, None)

    def test_voice_flow(self):
        m = mux()
        m.set_ptt(True)
        m.push_voice(b"opus1")
        st, f = m.tick()
        assert st == TxState.PREAMBLE and f is None
        st, f = m.tick()
        assert st == TxState.SENDVOICE
        assert f[:6] == bytes(6) or len(f) == CONFIG.frame_bytes
        assert f[12:17] == b"opus1"

    def test_aaaaa_overrides_voice(self):
        m = mux()
        m.set_ptt(True)
        m.push_voice(b"voice")
        m.tick()                       # preamble
        m.push_aaaaa(b"auth!")
        st, f = m.tick()
        assert st == TxState.INTERRUPTUS
        assert f[12:17] == b"auth!"
        st, f = m.tick()               # the buffered voice goes next
        assert st == TxState.SENDVOICE and f[12:17] == b"voice"

    def test_background_aborted_by_voice_and_requeued(self):
        m = mux()
        big = bytes(range(1, 129)) * 10        # 1280 bytes -> ~11 frames
        m.push_background(big)
        m.tick()                               # preamble
        st, f1 = m.tick()
        assert st == TxState.SENDDATA and f1 is not None
        # voice arrives mid-packet
        m.set_ptt(True)
        m.push_voice(b"ptt")
        st, f = m.tick()
        assert st == TxState.SENDVOICE and f[12:15] == b"ptt"
        # PTT released: the aborted packet restarts from the beginning, led
        # by a 0x00 delimiter that terminates the partial bytes already sent
        m.set_ptt(False)
        st, f2 = m.tick()
        assert st == TxState.SENDDATA
        assert f2[12] == 0                     # abort delimiter
        assert f2[13:] == f1[12:-1]            # then the restart
        # receiver's view: the partial old bytes + delimiter + restart must
        # decode to exactly the original packet (nothing merged/corrupted)
        stream = bytearray(f1[12:])            # partial bytes already on air
        stream.extend(f2[12:])
        for _ in range(12):
            st, fx = m.tick()
            if fx is None:
                break
            stream.extend(fx[12:])
        # drop everything before the first delimiter, then decode
        rest = bytes(stream[stream.index(0) + 1:])
        assert cobs_decode(rest) == big

    def test_chat_fills_idle_frames(self):
        m = mux()
        m.push_chat(b"hello world")
        m.tick()                               # preamble
        st, f = m.tick()
        assert st == TxState.SENDDATA
        assert cobs_decode(f[12:]) == b"hello world"

    def test_eot_after_hang(self):
        m = mux(hang_frames=2)
        m.push_chat(b"x")
        m.tick(); m.tick()                     # preamble + data
        st, _ = m.tick()
        assert st == TxState.HANGTIME
        st, _ = m.tick()
        assert st == TxState.SENDEOT
        st, _ = m.tick()
        assert st == TxState.IDLE

    def test_frames_are_well_formed(self):
        m = mux()
        m.push_chat(b"abc")
        m.tick()
        _, f = m.tick()
        assert len(f) == CONFIG.frame_bytes
        from opv_tpu.core.base40 import base40_decode
        assert base40_decode(f[:6]) == "W5NYV"
        assert f[6:9] == bytes([0xBB, 0xAA, 0xDD])

    def test_multiframe_chat_reassembly(self):
        m = mux()
        msg = bytes(np.random.default_rng(1).integers(0, 256, 400, dtype=np.uint8))
        m.push_chat(msg)
        m.tick()                               # preamble
        stream = bytearray()
        for _ in range(10):
            st, f = m.tick()
            if f is None:
                break
            stream.extend(f[12:])
        assert cobs_decode(bytes(stream)) == msg

    def test_stale_voice_does_not_key_transmitter(self):
        """A vocoder packet racing the PTT release must not keep the radio
        keyed forever (regression)."""
        m = mux(hang_frames=2)
        m.set_ptt(True)
        m.push_voice(b"last")
        m.set_ptt(False)               # drops the stale packet
        states = [m.tick()[0] for _ in range(6)]
        assert states[-1] == TxState.IDLE
        assert TxState.SENDVOICE not in states

    def test_urgent_chat_preempts_background_not_voice(self):
        """Urgent chat aborts an in-flight background stream; voice resumes
        right after the chat — bulk data never preempts voice (regression)."""
        m = mux()
        m.push_background(bytes(range(1, 100)) * 10)
        m.tick()                       # preamble
        m.tick()                       # background chunk 1
        m.set_ptt(True)
        m.push_voice(b"v0")
        m.push_chat(b"now!", urgent=True)
        st, f = m.tick()
        assert st == TxState.INTERRUPTUS
        # delimiter (from the aborted background) precedes the chat encoding
        assert cobs_decode(f[12:].lstrip(b"\x00")) == b"now!"
        m.push_voice(b"v1")
        st, f = m.tick()
        assert st == TxState.SENDVOICE and f[12:14] == b"v1"

    def test_urgent_multiframe_chat_not_interrupted_by_voice(self):
        """Urgency persists across all chunks of a multi-frame urgent chat
        (regression: previously only the queue head's flag was honored)."""
        m = mux()
        m.set_ptt(True)
        msg = bytes(range(1, 201))     # ~2 frames after COBS
        m.push_chat(msg, urgent=True)
        m.tick()                       # preamble
        chunks = bytearray()
        for _ in range(2):
            m.push_voice(b"vv")
            st, f = m.tick()
            assert st == TxState.INTERRUPTUS
            chunks.extend(f[12:])
        assert cobs_decode(bytes(chunks)) == msg

    def test_aaaaa_oversize_rejected(self):
        m = mux()
        import pytest as _p
        with _p.raises(ValueError):
            m.push_aaaaa(b"x" * 130)
