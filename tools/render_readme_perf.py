#!/usr/bin/env python
"""Single-source the README's performance numbers from BENCH_extra.json.

Every perf number in README.md lives inside a marker-delimited block

    <!-- BENCH:<name> -->
    ...generated markdown...
    <!-- /BENCH:<name> -->

rendered by this script from the checked-in ``BENCH_extra.json`` (the same
artifact the round driver snapshots as ``BENCH_r{N}.json``), so the README
can never drift from the measured record (VERDICT r3 next-step #2).

Usage:
    python tools/render_readme_perf.py            # rewrite README.md in place
    python tools/render_readme_perf.py --check    # exit 1 if README differs

``tests/test_readme_perf.py`` runs ``--check`` in the suite.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(ROOT, "README.md")
ARTIFACT = os.path.join(ROOT, "BENCH_extra.json")
#: the artifact the README was last rendered from.  ``BENCH_extra.json`` is
#: rewritten by every full ``bench.py`` run (including the round driver's),
#: so the sync test checks against this generation-time snapshot instead —
#: README and snapshot always move together in one commit.
SNAPSHOT = os.path.join(ROOT, "tools", "readme_bench_snapshot.json")


def _f(x, nd=2):
    """Fixed-point with nd decimals."""
    return f"{x:.{nd}f}"


def _g(x):
    """Billions, 2 decimals."""
    return f"{x / 1e9:.2f} G"


def _ms(x):
    return f"{x * 1e3:.2f}"


def _pct(x):
    return f"{100.0 * x:.0f}%"


def render_smoother(bench: dict) -> str:
    e = bench["extra"]["smoother"]["extra"]
    rows = [
        ("stored 19-plane (XLA)", "stored",
         f"{_pct(e['stored_pct_sol'])} of its HBM speed-of-light"),
        ("matrix-free (XLA)", "matfree",
         "XLA materializes pad/derivative temps"),
        ("compressed 10-plane (XLA)", "compressed", ""),
        ("compressed + Pallas kernel", "pallas",
         f"fused half-sweep, {_pct(e['pallas_pct_sol'])} of f32 "
         "memory-bandwidth speed-of-light"),
        ("**compressed + Pallas, bf16 blocks**", "pallas_bf16",
         f"≈ bf16 speed-of-light ({_pct(e['pallas_bf16_pct_sol'])} of the "
         "nominal-bandwidth model)"),
    ]
    out = ["| Path | voxel-updates/s | ms/sweep | notes |", "|---|---|---|---|"]
    for label, key, note in rows:
        ups = _g(e[f"{key}_updates_per_s"])
        ms = _ms(e[f"{key}_sweep_s"])
        if key == "pallas_bf16":
            ups, ms = f"**{ups}**", f"**{ms}**"
        out.append(f"| {label} | {ups} | {ms} | {note} |")
    return "\n".join(out)


def render_solve_galerkin(bench: dict) -> str:
    s = bench["extra"]["solve_galerkin_256"]
    lines = [
        f"End-to-end: a 256³ random-SPD-tensor implicit step solves to a "
        f"1e-6 relative\nresidual in "
        f"**{_ms(s['vcycle_solve_to_1e-6_s'])} ms** on one chip "
        f"({s['vcycle_cycles']} V-cycles, compressed operator + Pallas\n"
        f"smoother, f32).  Parabolic Galerkin coarse operators (closed-form "
        f"direct\nassembly, `ops/galerkin_direct.py`):",
        "",
        "| Galerkin variant | warm setup | solve to 1e-6 | vs DCA solve |",
        "|---|---|---|---|",
        f"| **collapsed (radius-1, Pallas coarse sweeps) — the default** | "
        f"**{_f(s['galerkin_collapsed_setup_warm_s'])} s** | "
        f"**{_f(s['galerkin_collapsed_solve_to_1e-6_s'], 3)} s** | "
        f"**{_f(s['galerkin_solve_over_dca'])}×** |",
        f"| exact (radius-2, ≤125 planes/level; radius-2 Pallas sweeps) | "
        f"{_f(s['galerkin_setup_warm_s'])} s (was 6.9 s comb-probed) | "
        f"{_f(s['galerkin_solve_to_1e-6_s'], 3)} s | "
        f"{_f(s['galerkin_exact_solve_over_dca'])}× |",
    ]
    return "\n".join(lines)


def render_cycle_breakdown(bench: dict) -> str:
    b = bench["extra"].get("cycle_breakdown")
    if not b:
        return "_(no cycle_breakdown block in this artifact)_"
    ph = b["phase_s_per_cycle"]
    sh = b["phase_share"]
    out = [
        "Per-phase roofline of one 256³ V-cycle (measured standalone per "
        "level,\nfori-loop-amortized; `bench.py --single 256 "
        "--breakdown-only`):",
        "",
        "| Phase | ms/cycle | share |",
        "|---|---|---|",
    ]
    for k in ("smoother", "residual", "transfer", "coarse_lu", "norm"):
        out.append(f"| {k} | {_ms(ph[k])} | {_pct(sh[k])} |")
    out += [
        "",
        f"Phase-sum vs a directly-timed V-cycle: "
        f"{_f(b['model_over_measured'], 2)}×.  Next bottleneck: "
        f"{b['next_bottleneck']}.",
    ]
    return "\n".join(out)


def render_ved(bench: dict) -> str:
    v = bench["extra"]["ved"]
    total = bench["value"]
    lines = [
        "| Stage | time |",
        "|---|---|",
        f"| vesselness pipeline (5 scales: Hessian, analytic eig, Frangi, "
        f"tensor; z-slab-tiled) | {_f(v['ved_pipeline_fd_s'])} s "
        f"(default `hessian_mode='smooth_fd'`; {_f(v['ved_pipeline_s'])} s "
        f"reference-exact `'gaussian_derivative'`, "
        f"**{_f(v['ved_pipeline_bf16_s'])} s** + "
        f"`pipeline_dtype='bfloat16'`) |",
        f"| hierarchy setup (compressed DCA, all levels + coarse LU) | "
        f"{_f(v['ved_setup_s'])} s |",
        f"| **diffusion solve to 1e-6 rel. residual** (Pallas RBGS V-cycles) "
        f"| **{_f(v['ved_solve_to_1e-6_s'])} s** f32 / "
        f"**{_f(v['ved_solve_bf16_to_1e-6_s'])} s** bf16-defect |",
        f"| **ONE measured end-to-end run** (bf16 smooth_fd pipeline → setup "
        f"→ bf16-defect solve, solve consuming that run's tensor) | "
        f"**{_f(v['ved_e2e_single_call_s'], 3)} s** (phase sum "
        f"{_f(v['ved_e2e_single_call_s'] / v['ved_e2e_over_phase_sum'], 2)} "
        f"s; {v['ved_e2e_cycles']} cycles, rel. residual "
        f"{v['ved_e2e_relres']:.1e}) |",
        "",
        "The north-star target is a converged 512³ VED solve to 1e-6 in <1 s "
        "on\n**eight** chips (v5e-8); the full workload beats that on **one** "
        f"chip:\n**{_f(total, 3)} s** measured as a single warm end-to-end "
        "run (`bench.py`'s\n`ved_e2e_single_call_s` — not a sum of "
        "separately-warmed phases) with\n`hessian_mode='smooth_fd'` + "
        "`pipeline_dtype='bfloat16'` +\n`defect_dtype='bfloat16'`.",
    ]
    if "ved_e2e_fmg_solve_to_1e-6_s" in v:
        fmg_s = v["ved_e2e_fmg_solve_to_1e-6_s"]
        ref_s = v["ved_solve_bf16_to_1e-6_s"]
        verdict = "adopted" if v.get("ved_e2e_fmg_adopted") else \
            "slower — the FMG init costs more than the cycle it saves, " \
            "so V-cycles stay the default"
        lines += [
            "",
            f"FMG datum: {_f(fmg_s, 3)} s ({v['ved_e2e_fmg_cycles']} cycles) "
            f"vs {_f(ref_s, 3)} s V-cycles — {verdict}.",
        ]
    if "ved_pipeline_dist_over_plain" in v:
        lines += [
            f"The shard_map-distributed kernel pipeline costs "
            f"{_f(v['ved_pipeline_dist_over_plain'])}× the plain one on a "
            "1-device mesh\n(`ved_pipeline_dist_over_plain` — the "
            "distribution wrapping is free)."
        ]
    return "\n".join(lines)


def render_weak_scaling(bench: dict) -> str:
    w = bench["extra"]["weak_scaling"]
    blk = w["block_128"]
    ov = blk["overlap_plumbing_efficiency_by_chips"]
    gs = blk["gspmd_plumbing_efficiency_by_chips"]

    def series(d):
        return " / ".join(_f(d[c]) for c in ("2", "4", "8") if c in d) or \
            " / ".join(_f(d[c]) for c in (2, 4, 8) if c in d)

    def get(d, c):
        return d.get(c) if c in d else d.get(str(c))

    ov_s = " / ".join(_f(get(ov, c)) for c in (2, 4, 8))
    gs_s = _f(get(gs, 8))
    lines = [
        "`bench.py`'s weak-scaling study times **2 full V-cycles of the MAD "
        "solve**\nat fixed per-chip blocks, 1→8 devices along one axis.  On "
        "virtual devices\nall \"chips\" share the host's silicon, so perfect "
        "weak scaling is\n`t_c = c·t_1` and the *plumbing efficiency* "
        "`t_1·c/t_c` lower-bounds what\nreal chips would see — and it "
        "penalizes every single-chip speedup (the\nround-4 coarse-inverse "
        "and kernel work cut `t_1` ~3×, which alone lowers\nthis ratio at "
        "fixed sharding overheads).  With 128³ per-chip blocks the\n"
        f"explicit-halo (overlap) path measures **{ov_s}** at 2/4/8 chips; "
        f"the gspmd\npath reads {gs_s} at 8.",
    ]
    b = w.get("breakdown")
    if b:
        eff = b["plumbing_efficiency_by_chips"]

        def e8(k):
            return _f(get(eff[k], 8))

        census = b["sweep_s_by_chips"]
        c8 = census.get(8) or census.get("8")
        cp_sweep = c8["gspmd_hlo_ops"]["collective_permute"] / 8
        lines += [
            "",
            "**Where the time goes** (fine-level sweep ablation, "
            "`weak_scaling.breakdown`):\nthe ppermute exchange alone is <1% "
            "of the sweep; a zero-communication\ncompute-only ablation "
            f"already drops to {e8('compute_only_no_comm')} efficiency at 8 "
            "virtual chips\n(8 device threads timesharing the host's 2 cores "
            "vs the 1-device baseline's\nintra-op threading), and the plain "
            f"shard_map path matches it at {e8('shard_map')} — the\n"
            "virtual-mesh loss is host-silicon contention, not halo "
            "machinery.  The\noverlap restructure pays its slab-splice cost "
            f"({e8('overlap')} here) with no real\ncommunication to hide; on "
            "a real chip the identical machinery costs\n"
            f"{_f(bench['extra']['dist_overhead_one_chip']['dist_over_plain'])}"
            "× (`dist_overhead_one_chip`).  The gspmd CPU partitioner emits "
            f"{cp_sweep:.0f}\ncollective-permutes per sweep (the hand path: "
            "4) plus a much larger\ndynamic-slice/fusion census — its "
            f"{e8('gspmd')} is partitioner program structure.\nOn real "
            "hardware the conventional `t_1/t_c` applies; the 2-host "
            "protocol is\nexercised by `tests/test_multihost.py`.",
        ]
    return "\n".join(lines)


def render_2d(bench: dict) -> str:
    s = bench["extra"].get("solve_2d_4096")
    if not s:
        return "_(no solve_2d_4096 block in this artifact)_"
    if "pallas_sweep_s" not in s:
        # pre-round-5 artifact: no 2D kernel datum yet
        return "\n".join([
            "The reference's own 2D workload class at 4096² (lena tensor "
            "diag(50, 30),\n`bench.py --single 4096 --2d-only`): the XLA "
            "red-black sweep runs at\n"
            f"{_g(s['stored_updates_per_s'])} voxel-updates/s stored "
            f"({_pct(s['stored_pct_sol'])} of HBM speed-of-light) and\n"
            f"{_g(s['compressed_updates_per_s'])} compressed "
            f"({_pct(s['compressed_pct_sol'])}); a full implicit step solves "
            f"to 1e-6 in\n**{_ms(s['solve_to_1e-6_s'])} ms** "
            f"({s['solve_cycles']} V-cycles, setup warm "
            f"{_f(s['setup_warm_s'], 3)} s).",
        ])
    speedup = s["compressed_sweep_s"] / s["pallas_sweep_s"]
    return "\n".join([
        "The reference's own 2D workload class at 4096² (lena tensor "
        "diag(50, 30),\n`bench.py --single 4096 --2d-only`): the XLA "
        "red-black sweep runs at\n"
        f"{_g(s['stored_updates_per_s'])} voxel-updates/s stored "
        f"({_pct(s['stored_pct_sol'])} of its HBM traffic model) and\n"
        f"{_g(s['compressed_updates_per_s'])} compressed "
        f"({_pct(s['compressed_pct_sol'])}) — round 4 wrongly called that "
        "\"near speed-of-light\";\nthe round-5 fused 2D Pallas sweep "
        f"measures **{_g(s['pallas_updates_per_s'])} updates/s** "
        f"({_f(speedup, 2)}× the XLA\nform), and the full implicit step "
        f"(Pallas sweeps + residual) solves to 1e-6 in\n"
        f"**{_ms(s['solve_to_1e-6_s'])} ms** ({s['solve_cycles']} V-cycles, "
        f"setup warm {_f(s['setup_warm_s'], 3)} s).",
    ])


RENDERERS = {
    "smoother-table": render_smoother,
    "solve-galerkin": render_solve_galerkin,
    "cycle-breakdown": render_cycle_breakdown,
    "ved-table": render_ved,
    "weak-scaling": render_weak_scaling,
    "solve-2d": render_2d,
}


def render(readme_text: str, bench: dict) -> str:
    def sub(m):
        name = m.group(1)
        body = RENDERERS[name](bench)
        return f"<!-- BENCH:{name} -->\n{body}\n<!-- /BENCH:{name} -->"

    pat = re.compile(
        r"<!-- BENCH:([a-z0-9-]+) -->\n.*?<!-- /BENCH:\1 -->", re.DOTALL
    )
    out, n = pat.subn(sub, readme_text)
    missing = set(RENDERERS) - set(
        re.findall(r"<!-- BENCH:([a-z0-9-]+) -->", readme_text)
    )
    if missing:
        raise SystemExit(f"README.md lacks BENCH markers for: {sorted(missing)}")
    return out


def main(argv):
    src = SNAPSHOT if "--check" in argv else ARTIFACT
    with open(src) as f:
        bench = json.load(f)
    with open(README) as f:
        text = f.read()
    new = render(text, bench)
    if "--check" in argv:
        if new != text:
            sys.stderr.write(
                "README.md perf blocks don't match the generation snapshot "
                "— run `python tools/render_readme_perf.py`\n"
            )
            return 1
        print("README.md perf blocks match the checked-in snapshot")
        return 0
    if new != text:
        with open(README, "w") as f:
            f.write(new)
        print("README.md perf blocks regenerated from BENCH_extra.json")
    else:
        print("README.md already up to date")
    with open(ARTIFACT) as f, open(SNAPSHOT, "w") as g:
        g.write(f.read())
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
