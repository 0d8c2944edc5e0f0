"""SIBR-viewer network bridge — gaussian_renderer/network_gui.py:26-85 protocol.

Wire-compatible server: the SIBR remote viewer connects over TCP, sends
little-endian length-prefixed JSON camera messages ({resolution_x/y, train,
fov_x/y, z_near/far, shs_python, rot_scale_python, keep_alive, scaling_modifier,
view_matrix, view_projection_matrix}), and receives raw RGB bytes followed by a
length-prefixed verify string. The y/z column sign flips applied by the
reference on incoming matrices are reproduced.

Usage inside a training loop (mirrors gaussian_splatting/train.py:83-101):

    gui = NetworkGUI()
    ...
    gui.poll(render_fn, keep_alive_default=True, source_path=dataset_path)

where render_fn(camera, scaling_modifier) -> [H, W, 3] float image in [0, 1].
"""

from __future__ import annotations

import json
import socket

import numpy as np

from gaustar_tpu.cameras import Camera


def camera_from_viewer_message(msg) -> Camera | None:
    """Build a Camera from the viewer's matrices (MiniCam equivalent)."""
    width = msg["resolution_x"]
    height = msg["resolution_y"]
    if width == 0 or height == 0:
        return None
    view = np.array(msg["view_matrix"], np.float64).reshape(4, 4)
    view[:, 1] *= -1
    view[:, 2] *= -1
    # The reference stores transposed (glm) matrices; logical w2c = view.T.
    w2c = view.T
    fovx = msg["fov_x"]
    fovy = msg["fov_y"]
    fx = width / (2.0 * np.tan(fovx / 2.0))
    fy = height / (2.0 * np.tan(fovy / 2.0))
    return Camera.from_w2c(
        w2c, fx, fy, width / 2.0, height / 2.0, int(width), int(height),
        znear=float(msg.get("z_near", 0.01)), zfar=float(msg.get("z_far", 100.0)),
    )


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def try_connect(self):
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout):
            pass

    def _read_msg(self):
        raw_len = self._recv_exact(4)
        n = int.from_bytes(raw_len, "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def send(self, image_bytes: bytes | None, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def poll(self, render_fn, keep_alive_default: bool, source_path: str = ""):
        """One train-loop poll: serve any connected viewer until it yields control
        (train.py:83-101 loop semantics). Returns True while training should run."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                msg = self._read_msg()
                cam = camera_from_viewer_message(msg)
                img_bytes = None
                if cam is not None:
                    img = np.asarray(render_fn(cam, float(msg.get("scaling_modifier", 1.0))))
                    img_bytes = (
                        np.clip(img, 0.0, 1.0) * 255.0
                    ).astype(np.uint8).tobytes()
                self.send(img_bytes, source_path)
                if bool(msg.get("train", True)) and (
                    not bool(msg.get("keep_alive", keep_alive_default))
                ):
                    return True
                if cam is None and not keep_alive_default:
                    return True
            except Exception:
                self.conn = None
        return True
