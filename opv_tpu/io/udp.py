"""Reusable UDP frame bridge (the reference's UDPServer, C18, as a library).

134-byte datagrams to/from Interlocutor.  Non-blocking socket + selectors,
usable standalone or inside the modem server event loop.
"""

from __future__ import annotations

import selectors
import socket

from opv_tpu.config import CONFIG


class UDPFrameBridge:
    """Non-blocking UDP endpoint exchanging fixed-size OPV frames."""

    def __init__(self, port: int = 0, host: str = ""):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.setblocking(False)
        self.port = self.sock.getsockname()[1]
        self.last_sender: tuple[str, int] | None = None
        self.rx_count = 0
        self.tx_count = 0
        self._sel = selectors.DefaultSelector()
        self._sel.register(self.sock, selectors.EVENT_READ)

    def fileno(self) -> int:
        return self.sock.fileno()

    def receive(self) -> bytes | None:
        """One frame if available, else None.  Malformed (wrong-size)
        datagrams are discarded and draining continues — they must not mask
        valid frames queued behind them."""
        while True:
            try:
                data, sender = self.sock.recvfrom(4096)
            except BlockingIOError:
                return None
            if len(data) != CONFIG.frame_bytes:
                continue
            self.last_sender = sender
            self.rx_count += 1
            return data

    def send(self, frame: bytes, dest: tuple[str, int] | None = None,
             response_port: int | None = None) -> bool:
        """Send a frame to dest, or back to the last sender (optionally on a
        different response port — the reference's -r semantics)."""
        if dest is None:
            if self.last_sender is None:
                return False
            dest = self.last_sender
        if response_port:
            dest = (dest[0], response_port)
        if len(frame) != CONFIG.frame_bytes:
            raise ValueError(f"frame must be {CONFIG.frame_bytes} bytes")
        self.sock.sendto(frame, dest)
        self.tx_count += 1
        return True

    def poll(self, timeout: float = 0.1):
        """Yield frames arriving within timeout seconds."""
        if self._sel.select(timeout=timeout):
            while True:
                f = self.receive()
                if f is None:
                    break
                yield f

    def close(self) -> None:
        self._sel.close()
        self.sock.close()
