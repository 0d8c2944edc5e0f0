"""Viewer network protocol: wire-compatible round trip."""

import json
import socket
import time
import threading

import numpy as np

from gaustar_tpu.tools.network_gui import NetworkGUI, camera_from_viewer_message


def _viewer_message(w=32, h=24, train=True, keep_alive=False):
    view = np.eye(4)
    return {
        "resolution_x": w, "resolution_y": h, "train": train,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": keep_alive, "scaling_modifier": 1.0,
        "view_matrix": view.flatten().tolist(),
        "view_projection_matrix": view.flatten().tolist(),
    }


def test_camera_from_message():
    cam = camera_from_viewer_message(_viewer_message())
    assert cam.width == 32 and cam.height == 24
    assert abs(float(cam.tanfovx) - np.tan(0.5)) < 1e-6
    assert camera_from_viewer_message({**_viewer_message(), "resolution_x": 0}) is None


def test_protocol_roundtrip():
    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    results = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        msg = json.dumps(_viewer_message()).encode()
        s.sendall(len(msg).to_bytes(4, "little") + msg)
        img = b""
        want = 32 * 24 * 3
        while len(img) < want:
            img += s.recv(want - len(img))
        vlen = int.from_bytes(s.recv(4), "little")
        verify = s.recv(vlen).decode()
        results["img"] = img
        results["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()

    def render_fn(cam, scaling):
        return np.full((cam.height, cam.width, 3), 0.5, np.float32)

    # poll until the client has connected and been served; under a loaded host
    # the client thread can take a while to connect, so poll on a time deadline
    # (not a fixed count) with a small sleep when nothing has arrived yet.
    deadline = time.monotonic() + 20.0
    while "verify" not in results and time.monotonic() < deadline:
        gui.poll(render_fn, keep_alive_default=False, source_path="/data/x")
        if "verify" not in results:
            time.sleep(0.01)
    t.join(timeout=5)
    assert results["verify"] == "/data/x"
    assert len(results["img"]) == 32 * 24 * 3
    assert results["img"][0] == 127  # 0.5 * 255
