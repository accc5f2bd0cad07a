"""Interactive free-viewpoint GUI (reference gui_human.py).

    python gui_human.py --cfg_file configs/enerf/interactive/zjumocap.yaml

Per frame: camera → interactive dataset query → jitted network →
GL texture blit (reference gui_human.py:85-120). Controls: left-drag
orbits about the origin, right-drag rotates in place, middle/shift-drag
pans, scroll zooms (moves along front), WASD+QE moves, SPACE toggles
frame autoplay, P toggles the B-spline camera rail, [-]/[=] scrub the
rail, ESC quits. The imgui menu of the reference is omitted (imgui is not
available in this image); all options are key-driven.

``--headless N`` renders N frames along the camera rail without a window
and writes ``interactive.mp4`` to the result dir — same code path as the
GUI minus the GL blit.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file",
                        default="configs/enerf/interactive/zjumocap.yaml")
    parser.add_argument("--headless", type=int, default=0, metavar="N",
                        help="render N rail frames to video instead of "
                             "opening a window")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args()


class Renderer:
    """Model + interactive dataset + camera (reference gui_human.py:30-120)."""

    def __init__(self, cfg):
        import jax

        from enerf_tpu.datasets.loader import make_dataset
        from enerf_tpu.factory import make_visualizer, network_class
        from enerf_tpu.interactive.camera import Camera
        from enerf_tpu.interactive.render_options import make_options
        from enerf_tpu.train.checkpoint import load_network
        from enerf_tpu.train.step import make_eval_step

        self.cfg = cfg
        self.opt = make_options(cfg)
        self.visualizer = make_visualizer(cfg)
        print("Loading dataset...")
        self.dataset = make_dataset(cfg, "test")

        self.frame_start = cfg.test_dataset.frames[0]
        self.frame_step = cfg.test_dataset.frames[2]
        self.frame_cnt = len(self.dataset)
        self.iter = 0

        worldup, front, center = self.dataset.get_camera_up_front_center()
        cen_tck, _, fro_tck, _, wup_tck, _ = self.dataset.get_camera_tck(
            smoothing_term=self.opt.smoothing_term)
        self.cam = Camera(worldup=worldup, front=front, center=center,
                          center_tck=cen_tck, front_tck=fro_tck,
                          worldup_tck=wup_tck)

        print("Loading network...")
        self.eval_step = make_eval_step(cfg, model_cls=network_class(cfg))
        self.variables = None
        self._load = lambda batch: self._init_and_load(batch)
        self.height, self.width = self.dataset.input_h_w
        self.fps_hist = []

    def _init_and_load(self, batch):
        import jax

        from enerf_tpu.factory import network_class
        from enerf_tpu.train.checkpoint import load_network

        model = network_class(self.cfg)(cfg=self.cfg.enerf, train_mode=False)
        variables = model.init(jax.random.PRNGKey(0), batch)
        try:
            variables, ep = load_network(self.cfg.trained_model_dir, variables)
            print(f"loaded checkpoint epoch {ep}")
        except FileNotFoundError:
            print(f"WARNING: no checkpoint under {self.cfg.trained_model_dir}")
        return variables

    @property
    def frame_curr(self):
        return self.frame_start + self.iter * self.frame_step

    def render_next(self) -> np.ndarray:
        import jax

        t0 = time.perf_counter()
        batch = self.dataset[(self.frame_curr, self.cam.get_c2w(),
                              self.cam.get_w2c())]
        if self.opt.autoplay:
            self.iter = (self.iter + 1) % self.frame_cnt
        if self.variables is None:
            self.variables = self._load(batch)
        out = self.eval_step(self.variables["params"],
                             self.variables["batch_stats"], batch)
        jax.block_until_ready(out)
        ret = self.visualizer.visualize(
            {k: np.asarray(v) for k, v in out.items()}, batch)
        img = ret[self.opt.type_mapping[self.opt.type]]
        self.fps_hist.append(1.0 / max(time.perf_counter() - t0, 1e-6))
        self.fps_hist = self.fps_hist[-10:]
        return np.asarray(img)

    @property
    def fps(self) -> float:
        """Trimmed mean of the last 10 samples (reference :202-224)."""
        h = sorted(self.fps_hist)
        h = h[1:-1] if len(h) > 2 else h
        return float(np.mean(h)) if h else 0.0


def draw_hud(img_u8: np.ndarray, rend: Renderer) -> np.ndarray:
    """Minimal on-screen state panel — the replacement for the
    reference's imgui widgets (gui_human.py:123-197; imgui is not
    installed in this image, so the state the panel showed is instead
    drawn into the frame): fps, frame index, autoplay, camera-rail
    state, render type, and the key bindings."""
    import cv2

    cam = rend.cam
    lines = [
        f"fps {rend.fps:5.2f}   frame {rend.frame_curr}"
        f"   play {'on' if rend.opt.autoplay else 'off'}",
        (f"rail {'on' if cam.on_cam_path else 'off'}"
         + (f" u={cam.cam_path_u:.2f}" if cam.on_cam_path else ""))
        if cam.has_cam_path else "rail n/a",
        f"view {rend.opt.type_mapping[rend.opt.type]}",
        "keys: SPACE play  P rail  -/= scrub  T view  H hud  ESC quit",
    ]
    out = np.ascontiguousarray(img_u8)
    for i, text in enumerate(lines):
        y = 16 + 14 * i
        # shadow + text for contrast on any scene
        cv2.putText(out, text, (7, y + 1), cv2.FONT_HERSHEY_PLAIN, 0.9,
                    (0, 0, 0), 2, cv2.LINE_AA)
        cv2.putText(out, text, (6, y), cv2.FONT_HERSHEY_PLAIN, 0.9,
                    (255, 255, 255), 1, cv2.LINE_AA)
    return out


def run_headless(rend: Renderer, n_frames: int):
    import os

    rend.cam.on_cam_path = True
    frames = []
    for i in range(n_frames):
        rend.cam.cam_path_u = i / max(n_frames, 1)
        rend.cam.update_from_cam_path()
        img = rend.render_next()
        from enerf_tpu import native

        frames.append(native.f32_unit_to_u8(img))
        print(f"frame {i + 1}/{n_frames}  fps={rend.fps:.2f}")

    from enerf_tpu.eval.visualizer import _write_video

    os.makedirs(rend.cfg.result_dir, exist_ok=True)
    path = os.path.join(rend.cfg.result_dir, "interactive.mp4")
    _write_video(path, frames, rend.cfg.fps)
    print(f"wrote {path}")


def run_gui(rend: Renderer):
    import glfw
    import OpenGL.GL as gl

    if not glfw.init():
        raise RuntimeError("glfw.init() failed (no display? use --headless)")
    glfw.window_hint(glfw.CONTEXT_VERSION_MAJOR, 3)
    glfw.window_hint(glfw.CONTEXT_VERSION_MINOR, 3)
    glfw.window_hint(glfw.OPENGL_PROFILE, glfw.OPENGL_COMPAT_PROFILE)
    window = glfw.create_window(rend.width, rend.height, "enerf-tpu", None,
                                None)
    if not window:
        glfw.terminate()
        raise RuntimeError("could not create glfw window")
    glfw.make_context_current(window)

    tex = gl.glGenTextures(1)
    gl.glBindTexture(gl.GL_TEXTURE_2D, tex)
    gl.glTexImage2D(gl.GL_TEXTURE_2D, 0, gl.GL_RGB8, rend.width, rend.height,
                    0, gl.GL_RGB, gl.GL_UNSIGNED_BYTE, None)
    gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MAG_FILTER,
                       gl.GL_NEAREST)
    gl.glTexParameteri(gl.GL_TEXTURE_2D, gl.GL_TEXTURE_MIN_FILTER,
                       gl.GL_NEAREST)
    fbo = gl.glGenFramebuffers(1)
    gl.glBindFramebuffer(gl.GL_READ_FRAMEBUFFER, fbo)
    gl.glFramebufferTexture2D(gl.GL_READ_FRAMEBUFFER, gl.GL_COLOR_ATTACHMENT0,
                              gl.GL_TEXTURE_2D, tex, 0)
    gl.glBindFramebuffer(gl.GL_READ_FRAMEBUFFER, 0)

    cam = rend.cam

    def mouse_button(_w, button, action, mods):
        x, y = glfw.get_cursor_pos(window)
        if action == glfw.PRESS:
            pan = (button == glfw.MOUSE_BUTTON_MIDDLE
                   or mods & glfw.MOD_SHIFT)
            about_origin = button == glfw.MOUSE_BUTTON_LEFT and not pan
            cam.begin_drag(x, y, is_pan=pan, about_origin=about_origin,
                           fix_y=bool(mods & glfw.MOD_CONTROL))
        elif action == glfw.RELEASE:
            cam.end_drag()

    def cursor_pos(_w, x, y):
        cam.drag_update(x, y)

    def scroll(_w, _dx, dy):
        cam.move(cam.v_front * 0.1 * dy)

    move_keys = {glfw.KEY_W: lambda: cam.v_front * 0.1,
                 glfw.KEY_S: lambda: -cam.v_front * 0.1,
                 glfw.KEY_A: lambda: -cam.v_right * 0.1,
                 glfw.KEY_D: lambda: cam.v_right * 0.1,
                 glfw.KEY_Q: lambda: -cam.v_world_up * 0.1,
                 glfw.KEY_E: lambda: cam.v_world_up * 0.1}

    def key(_w, k, _sc, action, _mods):
        if action not in (glfw.PRESS, glfw.REPEAT):
            return
        if k == glfw.KEY_ESCAPE:
            glfw.set_window_should_close(window, True)
        elif k == glfw.KEY_SPACE:
            rend.opt.autoplay = not rend.opt.autoplay
        elif k == glfw.KEY_P and cam.has_cam_path:
            cam.on_cam_path = not cam.on_cam_path
        elif k in (glfw.KEY_MINUS, glfw.KEY_EQUAL) and cam.has_cam_path:
            cam.cam_path_u = (cam.cam_path_u
                              + (0.02 if k == glfw.KEY_EQUAL else -0.02)) % 1.0
            cam.update_from_cam_path()
        elif k == glfw.KEY_T:
            rend.opt.type = (rend.opt.type + 1) % len(rend.opt.type_mapping)
        elif k == glfw.KEY_H:
            rend.opt.show_hud = not rend.opt.show_hud
        elif k in move_keys:
            cam.move(move_keys[k]())

    glfw.set_mouse_button_callback(window, mouse_button)
    glfw.set_cursor_pos_callback(window, cursor_pos)
    glfw.set_scroll_callback(window, scroll)
    glfw.set_key_callback(window, key)

    while not glfw.window_should_close(window):
        glfw.poll_events()
        img = rend.render_next()
        from enerf_tpu import native

        img = native.f32_unit_to_u8(img)
        if rend.opt.show_hud:
            img = draw_hud(img, rend)
        img = img[::-1]  # GL flip
        gl.glClear(gl.GL_COLOR_BUFFER_BIT | gl.GL_DEPTH_BUFFER_BIT)
        gl.glBindTexture(gl.GL_TEXTURE_2D, tex)
        gl.glTexSubImage2D(gl.GL_TEXTURE_2D, 0, 0, 0, img.shape[1],
                           img.shape[0], gl.GL_RGB, gl.GL_UNSIGNED_BYTE,
                           np.ascontiguousarray(img))
        gl.glBindFramebuffer(gl.GL_READ_FRAMEBUFFER, fbo)
        gl.glBlitFramebuffer(0, 0, img.shape[1], img.shape[0],
                             0, 0, rend.width, rend.height,
                             gl.GL_COLOR_BUFFER_BIT, gl.GL_LINEAR)
        gl.glBindFramebuffer(gl.GL_READ_FRAMEBUFFER, 0)
        glfw.swap_buffers(window)
        glfw.set_window_title(window, f"enerf-tpu  fps: {rend.fps:.2f}")
    glfw.terminate()


def main():
    args = parse_args()

    from enerf_tpu.config import make_cfg

    cfg = make_cfg(args.cfg_file, args.opts)
    from enerf_tpu.utils.profiling import setup_compile_cache

    setup_compile_cache()
    rend = Renderer(cfg)
    if args.headless > 0:
        run_headless(rend, args.headless)
    else:
        run_gui(rend)


if __name__ == "__main__":
    main()
