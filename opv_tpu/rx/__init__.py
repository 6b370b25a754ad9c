from opv_tpu.rx.viterbi import viterbi_decode, viterbi_decode_batch
from opv_tpu.rx.frame_decoder import decode_payloads
from opv_tpu.rx.cfo import estimate_cfo
from opv_tpu.rx.sync import SyncTrackerState, sync_tracker_init, sync_scan, sync_correlate
from opv_tpu.rx.demod import LoopState, loop_state_init, demodulate_block

__all__ = [
    "viterbi_decode", "viterbi_decode_batch", "decode_payloads",
    "estimate_cfo", "SyncTrackerState", "sync_tracker_init", "sync_scan",
    "sync_correlate", "LoopState", "loop_state_init", "demodulate_block",
]
