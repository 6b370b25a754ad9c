from opv_tpu.utils.display import print_frame, banner

__all__ = ["print_frame", "banner"]
