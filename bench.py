"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: **SpMV effective bandwidth (GB/s)** on the tet-cube-heat Laplacian
in f32 — the metric the BASELINE targets ("SpMV GB/s ... at >= 80% of the
SpMV bandwidth roofline").  ``vs_baseline`` is the fraction of the measured
device's HBM roofline achieved (so 0.8 == the BASELINE target).

Extra fields record CG solve times (Jacobi and, when available, AMG) on the
same mesh plus a 1M-DOF generated box — the "CG+AMG solve time to 1e-8"
half of the BASELINE metric.

Run on whatever backend is available (TPU under the driver; CPU works too).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TET_CUBE = "/root/reference/data/tet-cube-heat.exo"

# HBM bandwidth rooflines (GB/s) by device kind keyword.
ROOFLINES = {
    "v5 lite": 819.0,  # TPU v5e
    "v5litepod": 819.0,
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6": 1640.0,  # v6e (Trillium)
    "cpu": 50.0,  # nominal, for local smoke runs
}


def roofline_for(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in ROOFLINES.items():
        if key in kind:
            return bw
    return 819.0


def _sync(out):
    """Force completion via a host fetch — ``block_until_ready`` alone has
    been observed not to fence remote (tunneled) device execution here."""
    import jax.numpy as jnp
    import numpy as np

    return float(np.asarray(jnp.ravel(out)[0]))


def time_fn(fn, *args, iters=50, warmup=5, reps=3):
    """Best-of-reps average, host-fetch synced."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def time_spmv_loop(A, x, iters=None, reps=3, k_lo=64, k_hi=320):
    """Marginal per-SpMV device time via a two-point chained-loop fit.

    Each iteration feeds the next inside one ``lax.fori_loop`` program, so
    neither XLA nor the async runtime can overlap or elide work; values are
    rescaled each step to stay finite in f32.  The tunneled device in this
    environment adds a large *fixed* latency per jit invocation (measured
    ~30 ms — dispatch RTT, independent of the loop length), so a single
    total/k quotient overstates per-op time by 30ms/k.  Timing the same
    program at two chain lengths and taking (T_hi - T_lo)/(k_hi - k_lo)
    cancels the fixed term exactly and reports the true device-side
    marginal cost (best of ``reps`` per point)."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial

    if iters is not None:  # legacy single-point mode
        k_lo, k_hi = iters, 5 * iters

    @_partial(jax.jit, static_argnames=("k",))
    def loop(A, x, k):
        scale = jnp.asarray(0.02, x.dtype)  # < 1/(2*max_degree)

        def body(i, v):
            return A.matvec(v) * scale

        return jax.lax.fori_loop(0, k, body, x)

    _sync(loop(A, x, k_lo))  # compile + warm
    _sync(loop(A, x, k_hi))

    def best_total(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(loop(A, x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = best_total(k_lo), best_total(k_hi)
    marginal = max(t_hi - t_lo, 1e-12) / (k_hi - k_lo)
    # The fit differences two ~30 ms wall totals, so dispatch jitter
    # (~0.5 ms) swamps the signal for microsecond-scale ops.  Re-fit with a
    # chain long enough that the measured window is >= ~20 ms.
    if marginal * (k_hi - k_lo) < 0.02:
        k_hi2 = min(int(0.02 / max(marginal, 1e-9)) + k_lo, 16384)
        if k_hi2 > 2 * k_hi:
            _sync(loop(A, x, k_hi2))
            t_hi2 = best_total(k_hi2)
            marginal = max(t_hi2 - t_lo, 1e-12) / (k_hi2 - k_lo)
    return marginal


def measured_stream_gbps(reps=3):
    """Empirical streaming roofline: chained triad on 64M f32.

    The tunneled TPU in this environment delivers a small fraction of the
    device's nominal HBM bandwidth, so roofline fractions are reported
    against BOTH nominal spec and this measured ceiling."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial as _partial

    big = jnp.asarray(np.ones(1 << 26, dtype=np.float32))

    @_partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        return jax.lax.fori_loop(0, k, lambda i, v: v * 0.999 + 0.001, x)

    # Two-point fit cancels the fixed per-dispatch tunnel latency (see
    # time_spmv_loop) so the ceiling is the device's, not the tunnel's.
    _sync(loop(big, 4))
    _sync(loop(big, 16))

    def best_total(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(loop(big, k))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = max(best_total(16) - best_total(4), 1e-12) / 12
    return 2 * big.size * 4 / dt / 1e9


def _probe_backend_subprocess(timeout_s=90):
    """True if a throwaway subprocess can init the backend AND move bytes.

    Tunnel outages show up two ways: ``jax.devices()`` raising, or — worse
    — blocking indefinitely inside PJRT client creation (observed: >12 h).
    A hang can't be recovered in-process (the signal-based raise is
    deferred while the GIL sits in the C call), so health is probed in a
    subprocess that can be killed."""
    import subprocess
    import sys as _sys

    code = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "x = jnp.asarray(np.ones(1 << 20, np.float32))\n"
        "assert float(x[0]) == 1.0\n"
        "print(d[0].platform)\n"
    )
    try:
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return r.returncode == 0 and r.stdout.strip() not in ("", "cpu")
    except subprocess.TimeoutExpired:
        return False


def _init_backend_with_retry(max_tries=30, sleep_s=45):
    """Touch the backend early, retrying through tunnel outages.

    The axon TPU plugin intermittently fails to initialize for minutes at
    a time (raising OR hanging); a failed first touch would otherwise
    abort or wedge the whole bench.  Each attempt first health-checks the
    tunnel in a killable subprocess, then inits in-process.  Falls back to
    CPU after the retry budget so the driver always gets an artifact
    (clearly marked by device_kind)."""
    import time as _time

    import jax

    for attempt in range(max_tries):
        if not _probe_backend_subprocess():
            print(f"# backend probe unhealthy (attempt {attempt})", flush=True)
            _time.sleep(sleep_s)
            continue
        try:
            return jax.devices()
        except RuntimeError as e:
            print(f"# backend init failed (attempt {attempt}): {e}", flush=True)
            try:
                import jax._src.xla_bridge as xb

                xb._clear_backends()
            except Exception:
                pass
            _time.sleep(sleep_s)
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()


def main():
    import jax
    import jax.numpy as jnp

    _init_backend_with_retry()
    # x64 for the f64 outer refinement of the 1e-8 solves; all f32
    # sections build their arrays with explicit dtypes, so this only
    # affects the intended f64 paths.
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache: repeat invocations skip the 3-40 s
    # first-compile of every program (VERDICT r3 item 6).
    from domain_decomposed_pde_solver_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from domain_decomposed_pde_solver_tpu.io import read_exodus
    from domain_decomposed_pde_solver_tpu.io.boxmesh import box_mesh
    from domain_decomposed_pde_solver_tpu.models import assemble_heat_system
    from domain_decomposed_pde_solver_tpu.ops import (
        choose_operator,
        operator_bytes,
    )
    from domain_decomposed_pde_solver_tpu.solvers import cg_solve, jacobi_preconditioner

    dev = jax.devices()[0]
    extra = {"device": str(dev), "device_kind": getattr(dev, "device_kind", "?")}

    # NOTE: operators are always passed as jit *arguments* (pytrees) — this
    # platform permanently degrades if a jit ever embeds large constants
    # (closure capture), see solvers/cg.py API note.

    # Empirical streaming ceiling of THIS device.  The tunnel flips between
    # performance states (measured ~105 vs ~680 GB/s across connections/
    # minutes); probe until a good state is seen so the recorded numbers
    # reflect the device, not connection luck.  All probes are recorded.
    probes = []
    stream = 0.0
    for _ in range(6):
        stream = measured_stream_gbps()
        probes.append(round(stream, 1))
        if stream >= 400.0:
            break
        time.sleep(45)
    extra["measured_stream_gbps"] = stream
    extra["stream_probes_gbps"] = probes

    # --- SpMV on tet-cube-heat (unstructured) ----------------------------
    # choose_operator(bsg="auto") picks the BSG shuffle-gather Pallas path
    # on TPU (17x over Split-ELL on v5e); Split-ELL elsewhere.
    mesh = read_exodus(TET_CUBE)
    system = assemble_heat_system(mesh)
    A = choose_operator(system.A, dtype=jnp.float32, bsg="auto")
    x = A.put_vector(
        np.random.default_rng(0).standard_normal(system.n_free).astype(np.float32)
    )
    dt = time_spmv_loop(A, x, iters=64)
    # Effective bandwidth at CSR-equivalent useful traffic (nnz * (val +
    # index) + x + y in f32) — the format-independent figure of merit; the
    # actual streamed bytes of the chosen format are reported alongside.
    useful = system.A.nnz * 8 + 2 * system.n_free * 4
    gbps = useful / dt / 1e9
    extra["spmv_us_tet_cube"] = dt * 1e6
    extra["spmv_gbps_tet_cube"] = gbps
    extra["spmv_gbps_tet_cube_streamed"] = operator_bytes(A) / dt / 1e9
    extra["spmv_format_tet_cube"] = type(A).__name__
    extra["spmv_nnz"] = int(system.A.nnz)

    # --- ~1M DOF box (structured): auto format -> DIA (gather-free) ------
    from domain_decomposed_pde_solver_tpu.solvers.precond.amg import (
        infer_free_grid,
    )

    mesh1m = box_mesh(100, 100, 100, elem_type="TETRA4")
    sys1m = assemble_heat_system(mesh1m)
    dims1m = infer_free_grid(mesh1m, sys1m.free_to_node)
    # pad_stencil="auto": on TPU the VMEM-tiled padded-3-D Pallas kernel
    # (single pass over x; 3.3x over the XLA window-slice form at 1M DOF).
    A1m = choose_operator(
        sys1m.A, dtype=jnp.float32, grid_dims=dims1m, pad_stencil="auto"
    )
    extra["box1m_format"] = type(A1m).__name__
    if hasattr(A1m, "pad_mask"):
        # Generate on device: a 4 MB host upload costs seconds when the
        # tunnel degrades (measured as low as 0.7 MB/s).
        x1m = (
            jax.random.normal(
                jax.random.PRNGKey(0), (A1m.n_pad,), jnp.float32
            )
            * A1m.pad_mask()
        )
    else:
        x1m = A1m.put_vector(
            np.random.default_rng(0).standard_normal(sys1m.n_free).astype(
                np.float32
            )
        )
    # 64 chained iterations amortize the per-dispatch/sync overhead of the
    # tunneled device (16 iters inflated per-SpMV time by ~2x).
    # Re-measure the stream ceiling next to this section: the tunneled
    # device flips between performance states (measured ~5x apart) over
    # minutes, so each section's roofline fraction uses the nearest
    # measurement (same good-state probing as at the start).
    stream_box = 0.0
    for _ in range(4):
        stream_box = measured_stream_gbps()
        if stream_box >= 400.0:
            break
        time.sleep(45)
    extra["measured_stream_gbps_box"] = stream_box
    dt1m = time_spmv_loop(A1m, x1m, iters=64)
    # Three accountings, most honest first (VERDICT r2 item 1):
    #   raw      — bytes the chosen format actually streams through HBM
    #   min-lb   — the x+y+corr lower bound of ANY stencil evaluation in
    #              this layout, at the probed stream rate
    #   f32equiv — useful traffic a value-storing format would move
    #              (legacy figure of merit, kept for comparability)
    raw_bytes = operator_bytes(A1m)
    gbps1m = raw_bytes / dt1m / 1e9
    lb_us = raw_bytes / max(stream_box, 1e-9) / 1e3  # us
    from domain_decomposed_pde_solver_tpu.ops.dia import DIAMatrix
    from domain_decomposed_pde_solver_tpu.ops.stencil import StencilOperator

    if isinstance(A1m, DIAMatrix):
        # A1m.dtype is the COMPUTE dtype (storage may be narrower).
        vb = A1m.dtype.itemsize
        eq_bytes = vb * (A1m.ndiags * A1m.n_pad + 2 * A1m.n_pad)
    else:
        # Pattern-broadcast stencils (XLA or Pallas): coefficients never
        # leave registers/VMEM; f32-equivalent = the traffic a
        # value-storing format would move.
        eq_bytes = 4 * (sys1m.A.nnz + 2 * A1m.n_pad)
    gbps1m_eq = eq_bytes / dt1m / 1e9
    extra["spmv_us_box1m"] = dt1m * 1e6
    extra["spmv_gbps_box1m"] = gbps1m
    extra["spmv_frac_of_stream_box1m_raw"] = gbps1m / max(stream_box, 1e-9)
    extra["spmv_min_traffic_lb_us_box1m"] = lb_us
    extra["spmv_vs_min_traffic_box1m"] = dt1m * 1e6 / max(lb_us, 1e-9)
    extra["spmv_gbps_box1m_f32equiv"] = gbps1m_eq
    extra["spmv_frac_of_stream_box1m"] = gbps1m_eq / max(stream_box, 1e-9)
    extra["box1m_dof"] = sys1m.n_free

    # --- ~10M DOF box SpMV: the HBM-honest scale (VERDICT r3 item 1) -----
    # At 1M DOF the x+y+corr working set (~12 MB) is VMEM-resident across
    # the chained timing loop, so the 1M figure measures on-chip reuse,
    # not HBM bandwidth.  At 10M (~123 MB) every stream genuinely hits
    # HBM; this section is the headline.  Built via the scan-free lattice
    # path (models/structured.py) — no mesh, no element scan, ~seconds.
    gbps10m = 0.0
    frac_box10m = 0.0
    try:
        from domain_decomposed_pde_solver_tpu.models.structured import (
            structured_box_parts,
        )
        from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
            pad_stencil_from_parts,
        )

        N10 = 217  # (N-2)^3 ~= 9.9M free DOF, same as bench10m.py
        t0 = time.perf_counter()
        po10 = structured_box_parts(N10, N10, N10, elem_type="TETRA4")
        A10 = pad_stencil_from_parts(po10["parts"])
        extra["box10m_build_s"] = time.perf_counter() - t0
        extra["box10m_dof"] = (N10 - 2) ** 3
        extra["box10m_format"] = type(A10).__name__
        stream_10m = 0.0
        for _ in range(4):
            stream_10m = measured_stream_gbps()
            if stream_10m >= 400.0:
                break
            time.sleep(45)
        extra["measured_stream_gbps_box10m"] = stream_10m
        x10 = (
            jax.random.normal(jax.random.PRNGKey(0), (A10.n_pad,), jnp.float32)
            * A10.pad_mask()
        )
        dt10 = time_spmv_loop(A10, x10, k_lo=16, k_hi=64)
        # Bracket the measurement (the device flips performance states):
        # the honest ceiling is the max of the probes on either side.
        stream_10m = max(stream_10m, measured_stream_gbps())
        extra["measured_stream_gbps_box10m"] = stream_10m
        raw10 = operator_bytes(A10)
        gbps10m = raw10 / dt10 / 1e9
        frac_box10m = gbps10m / max(stream_10m, 1e-9)
        extra["spmv_us_box10m"] = dt10 * 1e6
        extra["spmv_gbps_box10m"] = gbps10m
        extra["spmv_frac_of_stream_box10m_raw"] = frac_box10m
        extra["spmv_min_traffic_lb_us_box10m"] = (
            raw10 / max(stream_10m, 1e-9) / 1e3
        )
        extra["spmv_vs_min_traffic_box10m"] = dt10 * 1e6 / max(
            extra["spmv_min_traffic_lb_us_box10m"], 1e-9
        )
        del x10, A10, po10
    except Exception as e:
        extra["box10m_error"] = str(e)[:200]

    # --- CG+Jacobi solve time on tet-cube-heat ---------------------------
    b = A.put_vector(system.b.astype(np.float32))
    bscale = float(np.abs(system.b).max())
    bs = b / bscale  # scale so f32 stays in range
    M = jacobi_preconditioner(A)
    solve = lambda mi: cg_solve(
        A, bs, jnp.zeros_like(bs), precond=M, tol=1e-6, maxiter=mi
    )
    res = solve(600)
    _sync(res.x)
    t0 = time.perf_counter()
    res = solve(600)
    _sync(res.x)
    t_full = time.perf_counter() - t0
    extra["cg_jacobi_ms_tet_cube"] = t_full * 1e3
    extra["cg_iters_tet_cube"] = int(res.iterations)
    # Device-side estimate: difference out the fixed per-dispatch tunnel
    # latency with a half-iteration run (t_full - t_half == time of the
    # remaining iterations on device).
    half = max(int(res.iterations) // 2, 1)
    rh = solve(half)
    _sync(rh.x)
    t0 = time.perf_counter()
    rh = solve(half)
    _sync(rh.x)
    t_half = time.perf_counter() - t0
    frac = 1.0 - half / max(int(res.iterations), 1)
    if t_full > t_half > 0 and frac > 0:
        extra["cg_jacobi_ms_tet_cube_device_est"] = (t_full - t_half) / frac * 1e3

    # --- Fused whole-CG kernel (one pallas_call per solve) ---------------
    # Win-or-gate (VERDICT r2 item 4): the fused kernel is only the
    # production path if it beats the unfused loop on wall time; the bench
    # records the comparison either way.
    if type(A).__name__ == "BSGMatrix":
        try:
            from domain_decomposed_pde_solver_tpu.solvers import fused_cg_solve

            rf = fused_cg_solve(A, bs, tol=1e-6, maxiter=600)
            _sync(rf.x)
            t0 = time.perf_counter()
            rf = fused_cg_solve(A, bs, tol=1e-6, maxiter=600)
            _sync(rf.x)
            extra["cg_fused_ms_tet_cube"] = (time.perf_counter() - t0) * 1e3
            extra["cg_fused_iters_tet_cube"] = int(rf.iterations)
            if extra["cg_fused_ms_tet_cube"] >= extra["cg_jacobi_ms_tet_cube"]:
                extra["cg_fused_gated_off"] = (
                    f"fused {extra['cg_fused_ms_tet_cube']:.1f} ms >= "
                    f"unfused {extra['cg_jacobi_ms_tet_cube']:.1f} ms "
                    "at equal iterations; unfused lax.while CG stays the "
                    "default"
                )
        except Exception as e:  # Mosaic feature gaps shouldn't kill the run
            extra["cg_fused_error"] = str(e)[:200]

    # --- CG+AMG on tet-cube (unstructured greedy hierarchy) --------------
    from domain_decomposed_pde_solver_tpu.solvers import (
        smoothed_aggregation_setup as _sa_setup,
    )

    t0 = time.perf_counter()
    # Fine level in the BSG operator's space: smoothing rides the
    # shuffle-gather kernel instead of SplitELL.
    Atet = A
    Mtet = _sa_setup(
        system.A, dtype=jnp.float32,
        fine_operator=A if type(A).__name__ == "BSGMatrix" else None,
    )
    extra["amg_setup_s_tet_cube"] = time.perf_counter() - t0
    bt = Atet.put_vector(system.b.astype(np.float32))
    bts = bt / float(np.abs(system.b).max())
    tet_amg = lambda: cg_solve(
        Atet, bts, jnp.zeros_like(bts), precond=Mtet, tol=1e-6, maxiter=300
    )
    rt = tet_amg()
    _sync(rt.x)
    t0 = time.perf_counter()
    rt = tet_amg()
    _sync(rt.x)
    extra["cg_amg_ms_tet_cube"] = (time.perf_counter() - t0) * 1e3
    extra["cg_amg_iters_tet_cube"] = int(rt.iterations)

    # --- CG+AMG solve time on the 1M-DOF box (the BASELINE metric) -------
    from domain_decomposed_pde_solver_tpu.solvers import smoothed_aggregation_setup
    from domain_decomposed_pde_solver_tpu.ops.pallas.stencil_kernel import (
        PadStencilOperator,
    )

    t0 = time.perf_counter()
    M1m = smoothed_aggregation_setup(
        sys1m.A,
        dtype=jnp.float32,
        grid_dims=dims1m,
        # Fine level in the operator's own space: smoothing rides the
        # Pallas kernel, transfers are the pad-space brick reshapes.
        fine_operator=A1m if isinstance(A1m, PadStencilOperator) else None,
    )
    extra["amg_setup_s_box1m"] = time.perf_counter() - t0
    b1m = (
        A1m.put_vector_sparse(sys1m.b.astype(np.float32))
        if hasattr(A1m, "put_vector_sparse")
        else A1m.put_vector(sys1m.b.astype(np.float32))
    )
    b1s = b1m / float(np.abs(sys1m.b).max())
    amg_solve = lambda: cg_solve(
        A1m, b1s, jnp.zeros_like(b1s), precond=M1m, tol=1e-6, maxiter=200
    )
    res1m = amg_solve()
    _sync(res1m.x)
    t0 = time.perf_counter()
    res1m = amg_solve()
    _sync(res1m.x)
    extra["cg_amg_ms_box1m"] = (time.perf_counter() - t0) * 1e3
    extra["cg_amg_iters_box1m"] = int(res1m.iterations)

    # --- CG+AMG to 1e-8 (mixed precision) — the literal BASELINE metric --
    # f32 inner CG+AMG sweeps + on-device f64 residual/update; the sweep
    # loop is the solve, staging/fetch are reported separately (the
    # tunneled dev link inflates a single 1M-vector transfer to ~250 ms —
    # ~100x a real host link; see solvers/mixed.py).
    try:
        from domain_decomposed_pde_solver_tpu.solvers.mixed import (
            iterative_refinement_solve,
        )

        b64host = sys1m.b.astype(np.float64)
        b1dev = (
            A1m.put_vector_sparse(b64host, dtype=np.float64)
            if hasattr(A1m, "put_vector_sparse")
            else A1m.put_vector(b64host, dtype=np.float64)
        )
        # device_residual=True: the graph Laplacian's small-integer
        # entries are always f32-exact; skip the per-call O(nnz) scan the
        # auto gate would redo on both the warm and the timed call.
        mkw = dict(
            tol=1e-8, inner_tol=1e-6, inner_maxiter=200,
            precond=M1m, operator=A1m, b_device=b1dev,
            device_residual=True,
        )
        mr = iterative_refinement_solve(sys1m.A, b64host, **mkw)  # warm
        t0 = time.perf_counter()
        mr = iterative_refinement_solve(sys1m.A, b64host, **mkw)
        extra["cg_amg_1e8_total_ms_box1m"] = (time.perf_counter() - t0) * 1e3
        if mr.timings is not None:
            extra["cg_amg_1e8_ms_box1m"] = mr.timings["sweeps_ms"]
            # Decompose total - sweeps: staging (b upload skipped via
            # b_device; x0 device-side) vs the solution download, which the
            # tunnel inflates ~100x over a real host link.
            extra["cg_amg_1e8_stage_ms_box1m"] = mr.timings["stage_ms"]
            extra["cg_amg_1e8_fetch_ms_box1m"] = mr.timings["fetch_ms"]
        extra["cg_amg_1e8_relres_box1m"] = float(mr.relres)
        extra["cg_amg_1e8_sweeps_box1m"] = int(mr.refinements)
        extra["cg_amg_1e8_inner_iters_box1m"] = int(mr.inner_iterations)
        extra["cg_amg_1e8_converged_box1m"] = bool(mr.converged)
    except Exception as e:
        extra["cg_amg_1e8_error"] = str(e)[:200]

    # Headline: RAW streamed bandwidth (bytes actually moved / time) at the
    # 10M HBM-honest scale when available (VERDICT r3: the 1M working set
    # is VMEM-resident, so its "bandwidth" measures on-chip reuse);
    # fallback to the best of the smaller sections if the 10M leg failed.
    headline = gbps10m or max(extra["spmv_gbps_tet_cube_streamed"], gbps1m)
    rf = roofline_for(dev)
    extra["nominal_roofline_gbps"] = rf
    # BASELINE target: >= 80% of the SpMV bandwidth roofline.  On this
    # tunneled device the meaningful ceiling is the measured streaming rate
    # (re-measured per section — the device flips performance states);
    # vs_baseline = the headline section's fraction of (0.8 * its local
    # ceiling), all on the raw-bytes basis.  NOTE the 1M box kernel is
    # VPU-bound, not HBM-bound: ~21 VPU ops/slot over the padded space hits
    # the ~1 TFLOP/s f32 VPU ceiling at ~0.70 of stream — its speed of
    # light is compute; at 10M the same kernel is HBM-bound and measures
    # true stream fraction.
    frac_tet = extra["spmv_gbps_tet_cube_streamed"] / max(stream, 1e-9)
    frac_box = gbps1m / max(stream_box, 1e-9)
    extra["roofline_frac_tet"] = frac_tet
    extra["roofline_frac_box"] = frac_box
    extra["roofline_frac_box_f32equiv"] = gbps1m_eq / max(stream_box, 1e-9)
    best_frac = frac_box10m or max(frac_tet, frac_box)

    # The at-scale UNSTRUCTURED fraction lives in BENCH10M_UNSTR.json
    # (bench10m_unstructured.py, ~hour-long run — not repeated here); carry
    # its headline numbers into the per-round artifact so the driver JSON
    # doesn't show only the 20k-row tet fraction (VMEM-resident,
    # dispatch-bound — NOT a bandwidth number; VERDICT r4 items 5/8).
    unstr = {}
    try:
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH10M_UNSTR.json")
        with open(p) as f:
            u = json.load(f).get("extra", {})
        useful = u.get("spmv_frac_of_stream_useful")
        if useful is None and u.get("measured_stream_gbps"):
            useful = u.get("spmv_gbps_f32equiv", 0.0) / u[
                "measured_stream_gbps"
            ]
        unstr = {
            "unstr_dof": u.get("dof"),
            "unstr_spmv_frac_of_stream_raw": u.get(
                "spmv_frac_of_stream_raw"),
            "unstr_spmv_frac_of_stream_useful": useful,
            "unstr_bsg_layout": u.get("bsg_layout"),
        }
        extra.update({k: v for k, v in unstr.items() if v is not None})
    except Exception:
        pass

    # Full record -> file; stdout ends with a SHORT line the driver's tail
    # capture can always parse whole (BENCH_r04.json lost its head to
    # truncation when `extra` rode the final line — VERDICT r4 item 4).
    record = {
        "metric": "spmv_gbps",
        "value": round(headline, 2),
        "unit": "GB/s",
        "vs_baseline": round(best_frac / 0.8, 4),
        "extra": extra,
    }
    try:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        )
        with open(full_path, "w") as f:
            json.dump(record, f, indent=1)
    except Exception:
        full_path = None
    headline_line = {
        "metric": "spmv_gbps",
        "value": round(headline, 2),
        "unit": "GB/s",
        "vs_baseline": round(best_frac / 0.8, 4),
        "spmv_frac_of_stream_box10m_raw": round(frac_box10m, 4),
        "cg_amg_1e8_ms_box1m": round(
            extra.get("cg_amg_1e8_ms_box1m", 0.0), 1
        ),
        "full_record": full_path,
    }
    for k in ("unstr_spmv_frac_of_stream_useful", "unstr_dof",
              "unstr_bsg_layout"):
        if k in extra:
            v = extra[k]
            headline_line[k] = round(v, 4) if isinstance(v, float) else v
    print(json.dumps(headline_line))


if __name__ == "__main__":
    main()
