#!/usr/bin/env python
"""Benchmark sweep: run bench.py across model variants/sizes, emit a table.

Each configuration runs in its own subprocess (one process per TPU session —
the tunneled platform serializes device access), collecting the single JSON
line bench.py prints.  Results are written to ``benchmarks/results.jsonl``
(append, timestamped by the caller's filesystem) and rendered into
``BENCHMARKS.md`` as a markdown table.

Usage:
    python benchmarks/sweep.py                 # default sweep (~15 min on v5e)
    python benchmarks/sweep.py --quick         # unet_s only
    python benchmarks/sweep.py --configs unet_t unet_s:bilinear unet_s:hw=1024,batch=2
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
RESULTS = Path(__file__).resolve().parent / "results.jsonl"
TABLE = ROOT / "BENCHMARKS.md"
# Sections below this marker in BENCHMARKS.md are hand-written (probe
# results etc.) and survive sweep rewrites.
HAND_MARK = "<!-- sweep:hand-written sections below -->"

DEFAULT_SWEEP = [
    "unet_t",
    # unet_t is dispatch/overhead-bound at b=8; no-baseline because torch-CPU
    # b32 needs >20 min on this 1-core host (r3) — TPU-side numbers only
    "unet_t:batch=32,no-baseline",
    "unet_s",
    "unet_sa",
    "unet",
    "unet_pp_s",
    "unet_pp:no-baseline",   # the big nested variant; no torch model to baseline
    "yolov8_seg_s",
    "unet_s:bilinear",
    "unet_s:hw=1024,batch=2",
]


def parse_config(spec):
    """'name[:opt,opt...]' -> (name, argv) where opt is 'bilinear' or 'k=v'."""
    name, _, opts = spec.partition(":")
    argv = ["--model", name]
    for opt in filter(None, opts.split(",")):
        if "=" not in opt:
            argv.append(f"--{opt}")  # bare flags: bilinear, no-baseline, ...
        else:
            k, _, v = opt.partition("=")
            argv += [f"--{k}", v]
    return name, argv


def run_one(spec, timeout):
    name, argv = parse_config(spec)
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "bench.py"), *argv],
            capture_output=True, text=True, timeout=timeout, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        # the tunneled TPU's first-fetch warmup alone can reach 22 min
        # (CLAUDE.md) — skip the config, keep the sweep alive
        print(f"  {spec}: TIMEOUT after {timeout}s, skipping", file=sys.stderr)
        return None
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
    )
    if proc.returncode != 0 or line is None:
        print(f"  {spec}: FAILED rc={proc.returncode}", file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return None
    result = json.loads(line)
    result["config"] = spec
    return result


def run_latency(timeout):
    try:
        proc = subprocess.run(
            [sys.executable, str(ROOT / "bench.py"), "--latency"],
            capture_output=True, text=True, timeout=timeout, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        print(f"  latency: TIMEOUT after {timeout}s, skipping", file=sys.stderr)
        return None
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
    )
    if proc.returncode != 0 or line is None:
        print(f"  latency: FAILED rc={proc.returncode}", file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return None
    return json.loads(line)


def render_latency_table(lat):
    lines = [
        "",
        "## Single-slice latency (512², b=1, BN-folded predict)",
        "",
        "Steady-state per-slice ms (chained scan; see bench.py for why the",
        "~33 ms per-dispatch tunnel overhead is excluded).  \"ref comment\" is",
        "the reference's code-comment claim (/root/reference/train.py:250-254,",
        "hardware unspecified).",
        "",
        "| model | TPU ms | int8 ms | spread | ref comment ms | torch-CPU ms | vs torch-CPU |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, v in lat["per_model"].items():
        tcpu = v.get("torch_cpu_ms")
        speedup = ("—" if tcpu is None
                   else f"{tcpu / v['tpu_ms']:.0f}x")
        sp = v.get("spread_pct")
        int8_ms = v.get("tpu_int8_ms", "—")
        if v.get("int8_gated"):
            # Predictor serves float below INT8_MIN_BATCH (measured b=1
            # regression) — --int8 at b=1 delivers the float program
            int8_ms = f"{int8_ms} (gated→float)"
        lines.append(
            f"| {name} | {v['tpu_ms']} "
            f"| {int8_ms} "
            f"| {'—' if sp is None else f'±{sp / 2:.0f}%'} "
            f"| {v.get('ref_comment_ms', '—')} "
            f"| {tcpu if tcpu is not None else '—'} | {speedup} |"
        )
    lines.append("")
    return "\n".join(lines)


def render_table(rows):
    import datetime

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d")
    lines = [
        "# Benchmark sweep (bench.py, one v5e chip)",
        "",
        "Generated by `python benchmarks/sweep.py`.  Timing methodology in",
        "`bench.py` (chained-scan steps, device-fetch barriers).",
        "",
        f"Last sweep run: {stamp} (UTC).  Partial runs (`--configs`) update",
        "only their rows, so rows can mix sessions; the tunneled TPU drifts",
        "5-15% between sessions (CLAUDE.md).  The CANONICAL headline is the",
        "driver-recorded `BENCH_r{N}.json` (same bench.py chain, its own",
        "session) — in-table deltas are comparable, cross-table absolute",
        "gaps within the drift band are not.",
        "",
        "| config | combined slices/s | predict / train slices/s |"
        " int8 predict | spread | vs torch-CPU | GFLOP/slice | train MFU |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        mfu = r.get("train_mfu_pct")
        mfu_cell = "\u2014" if mfu is None else f"{mfu}%"
        vsb = r.get("vs_baseline")
        vsb_cell = "\u2014" if vsb is None else f"{vsb}x"
        # max-min spread of bench.py's in-process repeat trials.  CLAUDE.md
        # documents an additional 5-15% BETWEEN-process drift on this
        # tunneled TPU, so cross-row deltas inside that band are noise.
        ts, ps = r.get("train_spread_pct"), r.get("predict_spread_pct")
        spread_cell = ("\u2014" if ts is None
                       else f"\u00b1{max(ts, ps or 0.0) / 2:.0f}%")
        lines.append(
            f"| {r['config']} | {r['value']} "
            f"| {r.get('predict_slices_per_s', '—')} / {r.get('train_slices_per_s', '—')} "
            f"| {r.get('predict_int8_slices_per_s', '—')} "
            f"| {spread_cell} "
            f"| {vsb_cell} "
            f"| {r.get('fwd_gflops_per_slice', '—')} "
            f"| {mfu_cell} |"
        )
    lines.append("")
    return "\n".join(lines)


def _parse_row_lines(old):
    """config -> rendered row line from the previous throughput table."""
    found = {}
    in_tbl = False
    for line in old.splitlines():
        if line.startswith("| config |"):
            in_tbl = True
            ncols = line.count("|")
            continue
        if in_tbl:
            if not line.startswith("|"):
                break
            if line.startswith("|---"):
                continue
            if line.count("|") == ncols:  # skip stale-format rows
                found[line.split("|")[1].strip()] = line
    return found


def _merge_tables(text, old):
    """Merge the previous table's rows into a freshly rendered ``text``.

    A partial run (--configs/--quick) only re-benches some configs; rows it
    did NOT produce carry forward so the published table stays complete.
    Old configs keep their position (updated in place); new ones append.
    """
    old_rows = _parse_row_lines(old)
    new_rows = _parse_row_lines(text)
    if not old_rows or not new_rows:
        return text
    merged = {k: new_rows.get(k, v) for k, v in old_rows.items()}
    merged.update({k: v for k, v in new_rows.items() if k not in merged})
    out, emitted, in_tbl = [], False, False
    for line in text.splitlines():
        if line.startswith("| config |"):
            in_tbl = True
            out.append(line)
            continue
        if in_tbl and line.startswith("|---"):
            out.append(line)
            out.extend(merged.values())
            emitted = True
            continue
        if in_tbl and line.startswith("|") and emitted:
            continue  # the fresh rows, already emitted via merged
        in_tbl = in_tbl and line.startswith("|")
        out.append(line)
    return "\n".join(out)


def compose_table(old, rows, lat):
    """Compose the new BENCHMARKS.md from the previous text + this run.

    Freshly generated sections replace their predecessors; whatever this
    run did NOT produce is carried forward from ``old`` (the previous
    latency section, hand-written sections at/after HAND_MARK, and any
    throughput rows for configs this run didn't bench).
    """
    # Everything from HAND_MARK on is hand-written (probe results,
    # methodology notes) — carried forward verbatim on every rewrite.
    hand = ""
    if HAND_MARK in old:
        hand = old[old.index(HAND_MARK):]
        old = old[: old.index(HAND_MARK)]
    marker = "\n## Single-slice latency"
    if rows:
        text = _merge_tables(render_table(rows), old)
    else:
        # keep the last good throughput table; refresh only the latency
        # section (every throughput config failed/timed out this run)
        text = old
        if marker in text:
            text = text[: text.index(marker) + 1].rstrip() + "\n"
    if lat is not None:
        text += render_latency_table(lat)
    elif marker in old:
        # this run produced no latency result (--configs/--quick/timeout):
        # carry the previously published latency section forward instead
        # of silently deleting it
        text = text.rstrip() + "\n" + old[old.index(marker):]
    if hand:
        text = text.rstrip() + "\n\n" + hand
    return text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=None,
                    help="config specs, e.g. unet_s:bilinear unet_s:hw=1024,batch=2")
    ap.add_argument("--quick", action="store_true", help="unet_s only")
    ap.add_argument("--timeout", type=int, default=2400, help="per-config seconds")
    ap.add_argument("--no-table", action="store_true",
                    help="skip rewriting BENCHMARKS.md")
    ap.add_argument("--no-latency", dest="latency", action="store_false",
                    default=True, help="skip the b=1 latency table")
    args = ap.parse_args()

    sweep = args.configs or (["unet_s"] if args.quick else DEFAULT_SWEEP)
    rows = []
    for spec in sweep:
        print(f"benching {spec} ...", flush=True)
        r = run_one(spec, args.timeout)
        if r is not None:
            rows.append(r)
            print(f"  {json.dumps(r)}", flush=True)
            with RESULTS.open("a") as f:
                f.write(json.dumps(r) + "\n")
    lat = None
    if args.latency and not args.quick and not args.configs:
        print("benching latency ...", flush=True)
        lat = run_latency(args.timeout)
        if lat is not None:
            print(f"  {json.dumps(lat)}", flush=True)
            with RESULTS.open("a") as f:
                f.write(json.dumps({**lat, "config": "latency"}) + "\n")
    if (rows or lat is not None) and not args.no_table:
        old = TABLE.read_text() if TABLE.exists() else ""
        TABLE.write_text(compose_table(old, rows, lat))
        print(f"wrote {TABLE}")


if __name__ == "__main__":
    main()
