"""Live simulation visualizer.

Interface parity with the reference's ``livesim`` binary
(``livesim/src/main.rs:38-57``): shared simulation args, steps-per-frame
default 1 (``main.rs:77``), window sized to the domain, INFERNO palette with
amplitude scale 2 (``ui/src/lib.rs:115-123``,
``livesim/src/palette.rs:42-121``).

The reference renders through Vulkan swapchains with the GPU backends
*sharing* their compute context with the renderer (livesim/src/context.rs:
34-48). The TPU analog of that zero-copy idea: the palette *index* is
computed on device (a uint8 array, 4x smaller than f32 over the host link)
and only colorized host-side. Three frontends, picked automatically:

- ``matplotlib`` window when a display is available;
- ``--web``: a dependency-free MJPEG HTTP stream (``--port``, default 8000)
  — the natural "window" for a machine you only reach over SSH;
- ``--frames N --output-dir D``: headless PNG dump (also the test hook).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import threading
import time

import numpy as np

from ..utils.logs import init_logging
from ..utils.palette import AMPLITUDE_SCALE, inferno_lut
from . import shared


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="livesim", description="Gray-Scott reaction live simulation"
    )
    shared.add_shared_args(parser)
    parser.add_argument(
        "--web", action="store_true",
        help="Serve an MJPEG live stream over HTTP instead of opening a window",
    )
    parser.add_argument("--port", type=int, default=8000, help="HTTP port for --web")
    parser.add_argument(
        "--frames", type=int, default=0,
        help="Render N frames headlessly into --output-dir, then exit",
    )
    parser.add_argument("--output-dir", default=None, help="Directory for --frames")
    parser.add_argument(
        "--fps-cap", type=float, default=60.0, help="Maximum frames per second"
    )
    parser.add_argument(
        "--color-palette-resolution", type=int, default=256,
        help="Number of palette entries (livesim/src/main.rs:50-57 analog)",
    )
    return parser


class FrameSource:
    """Runs the simulation and yields palette-indexed uint8 frames."""

    def __init__(self, args):
        import jax.numpy as jnp

        self._jnp = jnp
        self.sim = shared.make_simulation(args)
        self.species = self.sim.make_species(shared.domain_shape(args))
        # steps per frame default 1 (livesim/src/main.rs:77)
        self.steps_per_frame = (
            args.nbextrastep if args.nbextrastep is not None else 1
        )
        self.lut = inferno_lut(getattr(args, "color_palette_resolution", 256))

    def next_rgb(self) -> np.ndarray:
        jnp = self._jnp
        self.sim.prepare_steps(self.species, self.steps_per_frame)
        v = self.species.result()
        # palette index on device: clamp(scale * v, 0, 1) * (n - 1)
        n = len(self.lut)
        idx = jnp.clip(v * np.float32(AMPLITUDE_SCALE), 0.0, 1.0) * float(n - 1)
        idx_host = np.asarray(idx.astype(jnp.int32 if n > 256 else jnp.uint8))
        return self.lut[idx_host]


def run_headless(src: FrameSource, frames: int, outdir: str) -> int:
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    width = max(len(str(max(frames - 1, 1))), 1)
    for i in range(frames):
        Image.fromarray(src.next_rgb(), "RGB").save(
            os.path.join(outdir, f"{i:0{width}d}.png")
        )
    return 0


def run_web(src: FrameSource, port: int, fps_cap: float, logger) -> int:
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from PIL import Image

    boundary = b"grayscottframe"
    min_dt = 1.0 / max(fps_cap, 1e-3)
    lock = threading.Lock()  # one simulation, many viewers

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path not in ("/", "/stream"):
                self.send_error(404)
                return
            if self.path == "/":
                body = (
                    b"<html><body style='background:#000;margin:0'>"
                    b"<img src='/stream' style='width:100%;image-rendering:pixelated'>"
                    b"</body></html>"
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header(
                "Content-Type",
                f"multipart/x-mixed-replace; boundary={boundary.decode()}",
            )
            self.end_headers()
            try:
                while True:
                    t0 = time.time()
                    with lock:
                        rgb = src.next_rgb()
                    buf = io.BytesIO()
                    Image.fromarray(rgb, "RGB").save(buf, "JPEG", quality=85)
                    data = buf.getvalue()
                    self.wfile.write(b"--" + boundary + b"\r\n")
                    self.wfile.write(b"Content-Type: image/jpeg\r\n")
                    self.wfile.write(
                        f"Content-Length: {len(data)}\r\n\r\n".encode()
                    )
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")
                    dt = time.time() - t0
                    if dt < min_dt:
                        time.sleep(min_dt - dt)
            except (BrokenPipeError, ConnectionResetError):
                return

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    logger.info("livesim web view at http://127.0.0.1:%d/", port)
    print(f"Serving live view at http://127.0.0.1:{port}/ (Ctrl-C to stop)",
          file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def run_window(src: FrameSource, fps_cap: float) -> int:
    import matplotlib

    matplotlib.use("TkAgg" if os.environ.get("DISPLAY") else "Agg")
    import matplotlib.pyplot as plt

    rows, cols = src.species.shape
    fig, ax = plt.subplots(figsize=(cols / 100, rows / 100), dpi=100)
    fig.canvas.manager.set_window_title("Gray-Scott reaction")
    ax.set_position((0, 0, 1, 1))
    ax.axis("off")
    im = ax.imshow(src.next_rgb())
    plt.show(block=False)
    min_dt = 1.0 / max(fps_cap, 1e-3)
    while plt.fignum_exists(fig.number):
        t0 = time.time()
        im.set_data(src.next_rgb())
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
        dt = time.time() - t0
        if dt < min_dt:
            time.sleep(min_dt - dt)
    return 0


def main(argv=None) -> int:
    logger = init_logging()
    from ..utils.runtime import apply_env_config

    apply_env_config()
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    src = FrameSource(args)
    logger.info(
        "livesim backend=%s domain=%dx%d steps/frame=%d",
        src.sim.name, args.nbrow, args.nbcol, src.steps_per_frame,
    )
    if args.frames:
        if not args.output_dir:
            print("--frames requires --output-dir", file=sys.stderr)
            return 2
        return run_headless(src, args.frames, args.output_dir)
    if args.web:
        return run_web(src, args.port, args.fps_cap, logger)
    if not os.environ.get("DISPLAY"):
        logger.info("no DISPLAY; falling back to --web mode")
        return run_web(src, args.port, args.fps_cap, logger)
    return run_window(src, args.fps_cap)


if __name__ == "__main__":
    sys.exit(main())
