import json, os, sys, time
sys.path.insert(0, '/root/repo')

print("== 1. headline bench ==", flush=True)
os.system("python bench.py 2>/dev/null")

print("== 2. livesim server-side A/B at 1080p over the tunnel ==", flush=True)
import io
import numpy as np
from PIL import Image
from grayscott_tpu.cli import livesim
from grayscott_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
args = livesim.build_parser().parse_args(["-r", "1080", "-c", "1920"])
src = livesim.FrameSource(args)
# warmup (compile)
for _ in range(3):
    src.next_idx()
N = 24
t0 = time.perf_counter()
for _ in range(N):
    rgb = src.frame()
    buf = io.BytesIO(); Image.fromarray(rgb, "RGB").save(buf, "JPEG", quality=85)
old_fps = N / (time.perf_counter() - t0)
t0 = time.perf_counter()
for _ in range(N):
    idx = src.frame_idx()
    body = np.ascontiguousarray(idx).tobytes()
new_fps = N / (time.perf_counter() - t0)
print(json.dumps({"livesim_ab": {"old_mjpeg_fps": round(old_fps, 2),
                                 "new_canvas_fps": round(new_fps, 2)}}),
      flush=True)
del src

print("== 3. autotune device-ranked re-sweep (RTT-dominated shapes) ==",
      flush=True)
from grayscott_tpu.bench import autotune
from grayscott_tpu.params import Parameters
params = Parameters()
for shape in ((512, 1024), (1080, 1920), (2048, 2048)):
    t0 = time.perf_counter()
    try:
        best = autotune.autotune(params, shape, "zero", persist=True,
                                 verbose=True)
    except Exception as e:
        print(f"{shape}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    slim = {k: v for k, v in best.items() if k != "candidates"}
    print(f"RESWEEP {shape}: {json.dumps(slim)} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
print("QUEUE_DONE", flush=True)
