"""Benchmark report generation: sweep JSON -> markdown/HTML tables.

The browsable-report analog of the reference's criterion HTML output
(``cargo criterion``'s ``target/criterion/reports``, README.md:153-173):
turns one or two sweep result files (written by ``harness.sweep
--output``) into a table of throughputs, with per-row deltas against a
stored baseline run for regression checking.

Rows are keyed on (backend, workload, shape, steps, boundary, dtype) so
results from mixed sweeps line up; baseline rows with no counterpart are
listed as "gone", new rows carry no delta.
"""

from __future__ import annotations

import html as _html
import json
from typing import Iterable, List, Mapping, Tuple


def load_results(path: str) -> List[dict]:
    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, list):
        raise ValueError(f"{path}: expected a JSON list of sweep results")
    return data


def row_key(r: Mapping) -> Tuple:
    return (
        r.get("backend"), r.get("workload", "compute"),
        tuple(r.get("shape", ())), r.get("steps"),
        r.get("boundary", ""), r.get("dtype", "") or "",
    )


def _fmt_shape(shape) -> str:
    return "x".join(str(s) for s in shape)


def build_rows(
    results: Iterable[Mapping], baseline: Iterable[Mapping] | None = None
) -> List[dict]:
    """Joined rows: each current result plus its baseline delta (%)."""
    base = {row_key(r): r for r in (baseline or [])}
    rows = []
    for r in results:
        k = row_key(r)
        cur = float(r["gcells_per_sec"])
        entry = {
            "backend": k[0], "workload": k[1],
            "shape": _fmt_shape(k[2]), "steps": k[3],
            "boundary": k[4], "dtype": k[5] or "float32",
            "gcells_per_sec": cur,
        }
        old = base.pop(k, None)
        if old is not None:
            prev = float(old["gcells_per_sec"])
            entry["baseline"] = prev
            entry["delta_pct"] = (cur / prev - 1.0) * 100.0 if prev else 0.0
        rows.append(entry)
    for k, old in base.items():
        rows.append({
            "backend": k[0], "workload": k[1], "shape": _fmt_shape(k[2]),
            "steps": k[3], "boundary": k[4], "dtype": k[5] or "float32",
            "gcells_per_sec": None,
            "baseline": float(old["gcells_per_sec"]),
        })
    return rows


_COLS = ("backend", "workload", "shape", "steps", "boundary", "dtype")


def _cells(row, with_delta: bool) -> List[str]:
    cur = row["gcells_per_sec"]
    cells = [str(row[c]) for c in _COLS]
    cells.append("gone" if cur is None else f"{cur:.2f}")
    if with_delta:
        if "delta_pct" in row:
            cells.append(f"{row['delta_pct']:+.1f}%")
        elif cur is None:
            cells.append(f"was {row['baseline']:.2f}")
        else:
            cells.append("new")
    return cells


def render_markdown(rows: List[dict], title: str = "Benchmark report") -> str:
    with_delta = any("baseline" in r for r in rows)
    header = list(_COLS) + ["Gcell/s"] + (["vs baseline"] if with_delta else [])
    lines = [f"# {title}", ""]
    lines.append("| " + " | ".join(header) + " |")
    lines.append("|" + "---|" * len(header))
    for row in rows:
        lines.append("| " + " | ".join(_cells(row, with_delta)) + " |")
    if with_delta:
        deltas = [r["delta_pct"] for r in rows if "delta_pct" in r]
        if deltas:
            lines += ["", f"Mean delta: {sum(deltas) / len(deltas):+.1f}% "
                      f"over {len(deltas)} matched rows."]
    return "\n".join(lines) + "\n"


def render_html(rows: List[dict], title: str = "Benchmark report") -> str:
    with_delta = any("baseline" in r for r in rows)
    header = list(_COLS) + ["Gcell/s"] + (["vs baseline"] if with_delta else [])
    out = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title><style>",
        "body{font:14px sans-serif;margin:2em}",
        "table{border-collapse:collapse}",
        "td,th{border:1px solid #999;padding:.3em .6em;text-align:right}",
        "td:first-child,th:first-child{text-align:left}",
        ".neg{color:#b00}.pos{color:#070}",
        "</style></head><body>",
        f"<h1>{_html.escape(title)}</h1><table><tr>",
    ]
    out += [f"<th>{_html.escape(h)}</th>" for h in header]
    out.append("</tr>")
    for row in rows:
        out.append("<tr>")
        for cell in _cells(row, with_delta):
            cls = ""
            if cell.endswith("%"):
                cls = " class='neg'" if cell.startswith("-") else \
                    " class='pos'"
            out.append(f"<td{cls}>{_html.escape(cell)}</td>")
        out.append("</tr>")
    out.append("</table></body></html>")
    return "".join(out)


def report(
    results_path: str, baseline_path: str | None = None,
    fmt: str = "markdown", title: str | None = None,
) -> str:
    results = load_results(results_path)
    baseline = load_results(baseline_path) if baseline_path else None
    rows = build_rows(results, baseline)
    if title is None:
        title = f"Benchmark report — {results_path}" + (
            f" vs {baseline_path}" if baseline_path else ""
        )
    if fmt in ("markdown", "md"):
        return render_markdown(rows, title)
    if fmt == "html":
        return render_html(rows, title)
    raise ValueError(f"unknown report format {fmt!r}")
