"""Persist hardware sweep results as autotune records.

Bridges sweep evidence to runtime behavior: ``scripts/sweep.py`` measures
pinned configurations in isolated subprocesses (one remote compile each),
but the backends adopt winners only through the autotune store
(``~/.cache/grayscott_tpu/autotune.json``). This tool reads one or more
sweep logs, groups results by (shape, boundary, dtype), and writes the
best measured configuration as that key's record — so e.g. a measured
species-packed win at 1080x1920 reaches every default `simulate` run
without re-tuning on the user's wall-clock time.

Only results at least ``--margin`` (default 2%) better than an existing
record replace it; every considered result is preserved in the record's
``candidates`` table for audit, marked ``"source": "sweep"``.

Usage::

    python scripts/adopt_sweep.py .sweep_r2_pack.log [more.log ...] \
        [--dry-run] [--margin 1.02]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from grayscott_tpu.bench import stats  # noqa: E402
from grayscott_tpu.ops import pallas_stencil as ps  # noqa: E402
from grayscott_tpu.params import Parameters  # noqa: E402
from grayscott_tpu.utils import cache  # noqa: E402


def parse_results(paths: list[str]) -> list[dict]:
    """Sweep-log RESULT lines (the JSON lines carrying gcells_per_sec)."""
    out = []
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "gcells_per_sec" in rec and "config" in rec:
                    out.append(rec)
    return out


def to_record(res: dict) -> dict:
    """An autotune-store record from one sweep RESULT line.

    The sweep child pins the simulation config; the record mirrors what
    measure_config would have persisted for the same run (engine inferred
    from the pinned flags; tile fields as pinned or None for
    heuristic-chosen)."""
    cfg = res["config"]
    pack = cfg.get("pack") == "on"
    if cfg.get("resident") == "on":
        engine = "resident"
    elif cfg.get("engine") == "mega":
        engine = "mega"
    elif cfg.get("engine") == "windowed" or cfg.get("tr") or cfg.get("k"):
        engine = "windowed"
    else:
        # engine=auto: the backend's static preference order picked the
        # engine; record the selection the same ladder will re-derive
        engine = None
    rec = {
        "engine": engine,
        "block_rows": cfg.get("tr"),
        "steps_per_call": cfg.get("k") or 16,
        "fold": cfg.get("fold") if isinstance(cfg.get("fold"), int) else 1,
        "pack": pack,
        # run_one's compute workload = wall clock; a device rate (on-chip
        # module time) rides along when the sweep child measured one. The
        # record's headline gcells_per_sec follows the autotuner's
        # convention: device when available, else wall.
        "wall_gcells_per_sec": round(res["gcells_per_sec"], 3),
        "gcells_per_sec": round(
            res.get("device_gcells_per_sec") or res["gcells_per_sec"], 3),
        "source": "sweep",
    }
    if res.get("device_gcells_per_sec"):
        rec["device_gcells_per_sec"] = round(res["device_gcells_per_sec"], 3)
    if res.get("stats"):
        # dispersion rides along so later adoptions can reason about
        # noise against THIS record too (bench/stats.py)
        rec["stats"] = res["stats"]
    if "tc" in cfg:
        # only a PINNED column tile goes into the record: _tiles treats a
        # present-but-None block_cols as an explicit full-width pin, which
        # would bypass choose_block_cols on wide domains
        rec["block_cols"] = cfg["tc"]
    return rec


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("logs", nargs="+", help="sweep log files")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--margin", type=float, default=1.02,
                   help="replace an existing record only when better by "
                   "this factor (guards against run-to-run noise)")
    p.add_argument("--platform", default="v5e",
                   help="autotune-store device-kind key the records are "
                   "for (utils.device.autotune_platform of the machine "
                   "that ran the sweep, e.g. v5e)")
    args = p.parse_args(argv)

    results = parse_results(args.logs)
    if not results:
        print("no RESULT lines found")
        return 1
    params = Parameters()
    store = cache.load_autotune()
    by_key: dict[str, list[dict]] = {}
    for res in results:
        cfg = res["config"]
        key = cache.autotune_key(
            args.platform, tuple(cfg.get("shape", (4096, 4096))),
            cfg.get("boundary", "zero"), params.stencil_name(),
            ps.KERNEL_VERSION, cfg.get("dtype", "float32"),
        )
        by_key.setdefault(key, []).append(res)
    changed = False
    for key, group in by_key.items():
        # rank on a CONSISTENT unit: on-chip device rate only when every
        # result in the group carries one, else wall for all (a device
        # rate is 2-6x a wall rate at small shapes — mixing units buries
        # the genuinely fastest candidate)
        if all(r.get("device_gcells_per_sec") for r in group):
            rank_key = lambda r: r["device_gcells_per_sec"]  # noqa: E731
        else:
            rank_key = lambda r: r["gcells_per_sec"]  # noqa: E731
        ranked = sorted(group, key=rank_key, reverse=True)
        # strip-store results are never auto-adopted: the autotune
        # record schema has no naive_fix field, and silently switching
        # the naive path's fix-up mechanism would change its bit-frozen
        # rounding — store mode stays an explicit CLI opt-in
        adoptable = [r for r in ranked
                     if r["config"].get("fix", "select") == "select"]
        if not adoptable:
            print(f"{key}: only strip-store results — nothing to adopt")
            continue
        best = to_record(adoptable[0])
        prev = store.get(key)
        candidates = [to_record(r) for r in ranked]
        if prev:
            # the previous record itself joins the audit table (else a
            # replaced verdict vanishes without trace), then its own
            # accumulated candidates
            prev_entry = {k2: v2 for k2, v2 in prev.items()
                          if k2 != "candidates"}
            candidates += [c for c in [prev_entry]
                           + prev.get("candidates", [])
                           if c not in candidates]
        # gate the challenger against the stored record in a MATCHED
        # unit: device-vs-device when both sides carry on-chip rates
        # (the r3 autotuner/defaults convention — such records always
        # keep wall_gcells_per_sec alongside), else wall-vs-wall
        # (legacy wall-only records store wall in gcells_per_sec).
        if prev and best.get("device_gcells_per_sec") and \
                prev.get("device_gcells_per_sec"):
            best_val = best["device_gcells_per_sec"]
            prev_val = prev["device_gcells_per_sec"]
            unit = "device"
        else:
            best_val = best.get("wall_gcells_per_sec",
                                best["gcells_per_sec"])
            prev_val = (prev or {}).get(
                "wall_gcells_per_sec",
                (prev or {}).get("gcells_per_sec", 0.0))
            unit = "wall"
        # noise gate (VERDICT r2 #5): a challenger with sample statistics
        # must beat the stored value beyond its OWN CI95 — a point win
        # inside the noise band is not evidence. The sweep's sample stats
        # are wall-clock, so the CI check applies on the wall comparison
        # only (device reps carry MAD <= 0.02 on this chip; the --margin
        # factor still gates them). Falls back to --margin for legacy
        # results without samples.
        noisy_win = False
        if prev and best.get("stats") and unit == "wall":
            noisy_win = not stats.significantly_better(
                best["stats"], prev_val)
        if prev and (noisy_win or prev_val * args.margin >= best_val):
            why = ("within the challenger's CI95 noise band" if noisy_win
                   else f"{unit} {prev_val} * margin >= {best_val}")
            print(f"{key}: keep existing "
                  f"{prev.get('gcells_per_sec')} ({why})")
            new = dict(prev, candidates=candidates)
        elif best["engine"] is None and not best["pack"] \
                and best.get("fold", 1) <= 1:
            # engine=auto unpacked unfolded winner: persist the auto
            # record (all fields null/defaults — behavior-neutral at
            # runtime, the static ladder re-derives the same selection)
            # so the candidates table survives for audit AND, crucially,
            # so a prior PIN is retired: reaching this branch means the
            # auto run beat the stored record past the margin gate, and
            # a stale engine/pack pin must not outlive a measured auto
            # victory (the backend follows the persisted verdict, which
            # would otherwise override the heuristics forever). (A
            # fold>1 winner MUST be adopted as a real pin: fold='auto'
            # only ever folds on a persisted record.)
            print(f"{key}: best is engine=auto unpacked "
                  f"({best['gcells_per_sec']})"
                  + (f" — retiring the stored "
                     f"{prev.get('engine') or 'auto'} verdict "
                     f"(was {prev.get('gcells_per_sec')})" if prev
                     else " — candidates recorded"))
            new = dict(best, candidates=candidates)
        else:
            print(f"{key}: adopt {best['engine']}"
                  f"{' pack' if best['pack'] else ''} "
                  f"@ {best['gcells_per_sec']} Gcell/s"
                  + (f" (was {prev.get('gcells_per_sec')})" if prev
                     else ""))
            new = dict(best, candidates=candidates)
        if new is not None and new != prev:
            store[key] = new
            changed = True
    if args.dry_run:
        print("(dry run: store not written)")
        return 0
    if changed:
        cache.save_autotune(store)
        print(f"wrote {cache._autotune_path()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
