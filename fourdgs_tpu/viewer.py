"""Live-viewer socket server (SIBR remote-viewer wire protocol).

Parity target: gaussian_renderer/network_gui.py in the reference — a
non-blocking TCP listener the training loop polls each iteration
(train.py:117-142): the viewer sends a little-endian length-prefixed JSON
camera message (resolution, fovs, z range, flattened view / view-projection
matrices with Y/Z columns negated, train/keep_alive flags, scaling modifier);
the trainer replies with raw RGB bytes (H·W·3, uint8, row-major) followed by
a length-prefixed verification string (the source path).
"""

from __future__ import annotations

import json
import socket
from typing import NamedTuple

import numpy as np


class ViewerCamera(NamedTuple):
    """MiniCam equivalent (scene/cameras.py:68-80): raw matrices, no R/T."""

    width: int
    height: int
    fovx: float
    fovy: float
    znear: float
    zfar: float
    world_view: np.ndarray  # [4,4] row-vector convention
    full_proj: np.ndarray
    camera_center: np.ndarray
    time: float

    @property
    def tanfovx(self):
        import math

        return math.tan(self.fovx / 2)

    @property
    def tanfovy(self):
        import math

        return math.tan(self.fovy / 2)


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: socket.socket | None = None

    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nviewer connected from {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout):
            pass

    def _read_msg(self) -> dict:
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def receive(self):
        """→ (ViewerCamera | None, do_training, keep_alive, scaling_modifier).

        Matrix handling mirrors network_gui.py:72-77: Y and Z columns of the
        view matrix negated (SIBR↔COLMAP handedness), Y column of the
        view-projection negated.
        """
        msg = self._read_msg()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        wv = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] = -wv[:, 1]
        wv[:, 2] = -wv[:, 2]
        fp = np.asarray(
            msg["view_projection_matrix"], np.float32
        ).reshape(4, 4)
        fp[:, 1] = -fp[:, 1]
        center = np.linalg.inv(wv.astype(np.float64)).T[:3, 3].astype(
            np.float32
        )
        cam = ViewerCamera(
            width=width, height=height,
            fovx=msg["fov_x"], fovy=msg["fov_y"],
            znear=msg["z_near"], zfar=msg["z_far"],
            world_view=wv, full_proj=fp, camera_center=center,
            time=float(msg.get("time", 0.0)),
        )
        return (cam, bool(msg["train"]), bool(msg["keep_alive"]),
                msg["scaling_modifier"])

    def send(self, image_chw: np.ndarray | None, verify: str):
        """Send raw RGB bytes then a length-prefixed verify string."""
        if image_chw is not None:
            img = np.clip(np.asarray(image_chw), 0.0, 1.0)
            payload = (
                (img.transpose(1, 2, 0) * 255).astype(np.uint8).tobytes()
            )
            self.conn.sendall(payload)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def poll(self, render_fn, source_path: str, training_done: bool) -> bool:
        """One training-loop poll (train.py:117-142 shape).

        ``render_fn(ViewerCamera) → np.ndarray [3,H,W]``. Returns the
        do_training flag (False only if the viewer paused training).
        """
        do_training = True
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, do_training, keep_alive, _scale = self.receive()
                img = render_fn(cam) if cam is not None else None
                self.send(img, source_path)
                if do_training and (not keep_alive or training_done):
                    break
            except Exception:
                self.conn = None
        return bool(do_training)

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
