from opv_tpu.core.base40 import base40_encode, base40_decode
from opv_tpu.core.lfsr import randomizer_mask
from opv_tpu.core.convcode import conv_encode_bits
from opv_tpu.core.interleave import interleave_perm, deinterleave_gather
from opv_tpu.core.framing import (
    encode_frame,
    build_bert_frame,
    pack_frame_bits,
    derandomize,
    frame_to_symbol_bits,
)

__all__ = [
    "base40_encode", "base40_decode",
    "randomizer_mask",
    "conv_encode_bits",
    "interleave_perm", "deinterleave_gather",
    "encode_frame", "build_bert_frame", "pack_frame_bits",
    "derandomize", "frame_to_symbol_bits",
]
