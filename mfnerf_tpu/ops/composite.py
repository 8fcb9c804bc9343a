"""Front-to-back volume compositing as differentiable scans — pure jnp.

TPU-native replacement for the reference CUDA kernels ``composite_train_fw``
/ ``composite_train_bw`` (models/csrc/volumerendering.cu:7-202) and
``composite_test_fw`` (:206-285).

Reformulation: per-ray sequential compositing is an exclusive cumulative
product of (1 - alpha) — an associative scan. The hand-derived CUDA backward
(suffix accumulators + thrust scans) becomes plain JAX autodiff through the
cumprod; early termination becomes the inclusion mask ``T > T_threshold``
which matches the reference's break semantics exactly: a sample contributes
iff the transmittance BEFORE it still exceeds the threshold
(volumerendering.cu:28-43 adds the sample, then breaks).

Inputs are the padded (N_rays, S) rows produced by ops/ray_march.py; the
reference's ``rays_a`` CSR segments disappear.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeResults(NamedTuple):
    opacity: jnp.ndarray      # (N,)
    depth: jnp.ndarray        # (N,)
    rgb: jnp.ndarray          # (N, 3)
    ws: jnp.ndarray           # (N, S) per-sample weights
    vr_samples: jnp.ndarray   # () int32 total composited samples (train/vr_s)


def composite_train(sigmas, rgbs, deltas, ts, mask, T_threshold=1e-4):
    """Composite padded sample rows front-to-back.

    Args:
        sigmas: (N, S) densities.
        rgbs: (N, S, 3) colors.
        deltas: (N, S) integration steps.
        ts: (N, S) sample distances.
        mask: (N, S) bool sample validity (invalid rungs contribute nothing).
        T_threshold: stop compositing when transmittance drops below this
            (1e-4 train / configurable test, reference rendering.py:103,150).

    Returns:
        :class:`CompositeResults`. Fully differentiable wrt sigmas/rgbs.
    """
    sigmas = sigmas.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    alpha = jnp.where(mask, 1.0 - jnp.exp(-sigmas * deltas), 0.0)  # (N,S)
    one_minus = 1.0 - alpha
    # exclusive cumprod: T before each sample
    t_excl = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[:, :1]),
                         one_minus[:, :-1]], axis=1), axis=1)
    include = (t_excl > T_threshold) & mask
    w = jnp.where(include, alpha * t_excl, 0.0)

    opacity = w.sum(axis=1)
    depth = (w * ts).sum(axis=1)
    rgb = (w[..., None] * rgbs.astype(jnp.float32)).sum(axis=1)
    vr_samples = include.sum()
    return CompositeResults(opacity=opacity, depth=depth, rgb=rgb, ws=w,
                            vr_samples=vr_samples)


class FlatCompositeResults(NamedTuple):
    opacity: jnp.ndarray      # (N,)
    depth: jnp.ndarray        # (N,)
    rgb: jnp.ndarray          # (N, 3)
    ws: jnp.ndarray           # (B,) flat per-sample weights
    w_excl: jnp.ndarray       # (B,) segment-exclusive cumsum of ws
    wm_excl: jnp.ndarray      # (B,) segment-exclusive cumsum of ws*ts
    vr_samples: jnp.ndarray   # () int32


# Default block width for the blocked segment helpers. INVARIANT every
# caller must satisfy: each segment's nonzero content lies within `block`
# slots of its segment start (the flat layouts bound per-ray sample counts
# by s_max_train / s_cap, both <= 128 at every shipped config; rendering.py
# passes block = max(SEG_BLOCK, s) where configs can exceed it).
SEG_BLOCK = 128


def _blocked_prefix(x, block):
    """Within-block inclusive cumsum + per-block totals.

    Why blocks instead of one global cumsum: the segment helpers below
    reconstruct SMALL per-segment values as prefix differences, and at
    production flat-batch sizes (~10^6-10^7 samples with sigma*dt up to 80)
    a GLOBAL prefix reaches ~10^7 where one fp32 ulp is ~1.0 — global-cumsum
    boundary differences were measured wrong by O(1) in sd_excl, i.e. the
    flat renderer's transmittance was off by factors of e^{+-1} (13-31 dB vs
    the oracle on TPU, 2026-08-18). A compensated double-single scan fixed
    that but cost 3.4 ms/step at the bench config (measured). Because every
    segment's content fits in `block` slots, prefix differences only ever
    need block-LOCAL prefixes plus at most two whole-block totals — all
    block-scale magnitudes, so plain fp32 is exact to ~block_sum ulps and no
    global-magnitude value is ever materialized or subtracted.

    Returns:
        (loc, totals): loc = x's shape, inclusive prefix restarted at every
        block boundary; totals = (ceil(B/block), ...) per-block sums.
    """
    b = x.shape[0]
    nb = -(-b // block)
    pad = nb * block - b
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    xb = x.reshape((nb, block) + x.shape[1:])
    loc_b = jnp.cumsum(xb, axis=1)
    totals = loc_b[:, -1]
    loc = loc_b.reshape((nb * block,) + x.shape[1:])
    return (loc[:b] if pad else loc), totals


def seg_sum(x, offsets, block=SEG_BLOCK):
    """Per-segment sums of a ray-ordered flat array. x: (B,) or (B, C);
    offsets: (N,) exclusive starts. Exact under the content-window invariant
    (see :data:`SEG_BLOCK`): the inclusive segment end is clamped into
    [start, start + block), which drops only slots that are zero by the
    invariant, so the difference spans at most one block boundary.

    Plain (autodiff) version for non-differentiated contexts; inside a
    training loss use :func:`seg_sum_l` — autodiff of the boundary gathers
    here transposes into B-element scatter-adds (~60 ns/update,
    docs/TPU_NOTES.md), which dominated the flat compositing backward
    (7.9 ms of the 17 ms step at the bench config, profile_stages)."""
    loc, totals = _blocked_prefix(x, block)
    b = x.shape[0]
    seg_end = jnp.concatenate(
        [offsets[1:], jnp.array([b], jnp.int32)]) - 1
    nonempty = seg_end >= offsets
    end_c = jnp.clip(seg_end, 0, jnp.minimum(offsets + (block - 1), b - 1))
    j = jnp.maximum(offsets - 1, 0)
    has_before = offsets > 0
    bb = jnp.where(has_before, j // block, 0)
    b_e = end_c // block
    carry_on = b_e > bb
    nb = totals.shape[0]
    t1 = totals[jnp.minimum(bb, nb - 1)]
    base = loc[j]
    if x.ndim == 2:
        nonempty = nonempty[:, None]
        has_before = has_before[:, None]
        carry_on = carry_on[:, None]
    t1 = jnp.where(carry_on, t1, 0.0)
    base = jnp.where(has_before, base, 0.0)
    return jnp.where(nonempty, t1 + (loc[end_c] - base), 0.0)


def _segment_flags(ray_id):
    """(B,) bool — True at each segment's first slot. Gather-free: on the
    sorted ray_id a segment starts exactly where the id changes (empty
    segments collapse onto the next nonempty one's start, which is the
    correct scan-reset semantics — they have no slots to reset)."""
    return jnp.concatenate(
        [jnp.ones((1,), bool), ray_id[1:] != ray_id[:-1]])


def _segscan(x, flags, reverse=False):
    """Segmented inclusive scan: per-slot sum of its segment's prefix.

    ONE lax.associative_scan with the classic (flag, value) reset operator
    — measured 0.47 ms at B=131072 on this chip vs 2.83 ms for the blocked
    gather-based reconstruction it replaced (benchmarking/probe_segscan.py,
    2026-08-19): the blocked scheme paid ~4 B-element structural gathers
    (~1 ms each) per pass, while the scan is a pure VPU pipeline. Numerics:
    the operator RESETS at segment boundaries, so magnitudes stay
    segment-local by construction — the fp32 global-prefix catastrophe that
    motivated the blocked scheme (prefix ~1e7, ulp ~1, e^{+-1} transmittance
    errors) cannot occur at any batch size.

    ``reverse=True`` computes the segmented inclusive SUFFIX scan (the
    transpose direction): the reversed array's segment starts are the
    original segment ENDS (slot i is an end iff slot i+1 is a start).
    """
    f = flags
    if reverse:
        f = jnp.concatenate([flags[1:], jnp.ones((1,), bool)])
        x = jnp.flip(x, 0)
        f = jnp.flip(f, 0)
    expand = (Ellipsis,) + (None,) * (x.ndim - 1)

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, vb + va * (1.0 - fb.astype(va.dtype)[expand])

    _, y = jax.lax.associative_scan(op, (f, x), axis=0)
    return jnp.flip(y, 0) if reverse else y


def _content_window_mask(ray_id, offsets, block, ndim):
    """(B,) bool — True where slot i lies inside its segment's content
    window [offsets[ray_id[i]], offsets[ray_id[i]] + block). Broadcast to
    ``ndim`` dims so it applies directly to (B,) or (B, C) cotangents.
    Shared by the segment-helper adjoints below."""
    b = ray_id.shape[0]
    beg = jnp.take(offsets, ray_id)
    m = (jnp.arange(b, dtype=jnp.int32) - beg) < block
    if ndim == 2:
        m = m[:, None]
    return m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def seg_sum_l(x, ray_id, offsets, block=SEG_BLOCK):
    """:func:`seg_sum` with an exact LINEAR custom adjoint (scatter-free).

    seg_sum is linear in x: y[r] = sum of x over segment r's content window
    [start_r, start_r + block). Its adjoint is therefore a broadcast —
    dx[i] = g[ray_id[i]] for i inside its segment's window, 0 past it (the
    forward's end-clamp drops those slots) — i.e. one sorted B-row gather
    instead of the scatter-adds autodiff derives by transposing the
    forward's boundary gathers.

    ``ray_id`` is only read by the adjoint, and MUST be consistent with
    ``offsets``: ray_id[i] = r iff offsets[r] <= i < offsets[r+1], with any
    tail padding assigned to the last ray. The forward ignores ray_id, so an
    inconsistent pair yields a correct forward with a silently wrong
    backward.

    An earlier linear-adjoint probe against the compensated TwoSum-scan
    helpers measured SLOWER (R3 queue, 2026-08-18) because its adjoint
    re-ran the expensive compensated scan; the blocked helpers' adjoint is
    a plain gather + compare, which is where the win comes from.
    """
    return seg_sum(x, offsets, block)


def _seg_sum_l_fwd(x, ray_id, offsets, block):
    return seg_sum(x, offsets, block), (ray_id, offsets)


def _seg_sum_l_bwd(block, res, g):
    ray_id, offsets = res
    dx = jnp.take(g, ray_id, axis=0)
    in_window = _content_window_mask(ray_id, offsets, block, dx.ndim)
    return jnp.where(in_window, dx, 0.0), None, None


seg_sum_l.defvjp(_seg_sum_l_fwd, _seg_sum_l_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_rows_sorted(table, ray_id, offsets, block=SEG_BLOCK):
    """Gather ``table`` (N, C) rows by a SORTED segment-contiguous ``ray_id``
    (B,) whose segment starts are ``offsets`` (N,).

    Functionally ``table[ray_id]``, but with a custom VJP: the generic gather
    backward is a B-update scatter-add (~60 ns/update on this chip,
    docs/TPU_NOTES.md), while sortedness makes it an exact per-segment sum —
    block-local cumsum plus boundary differences (:func:`seg_sum`). This lets
    the flat (ragged) training path carry pose-refinement gradients through
    per-ray geometry without any scatter in the backward program. ``block``
    is the static content-window bound (see :data:`SEG_BLOCK`).
    """
    return table[ray_id]


def _gather_rows_fwd(table, ray_id, offsets, block):
    # dtype rides along as a zero-size array: residuals must be JAX types
    # (a raw np.dtype fails when the VJP is staged inside control flow)
    return table[ray_id], (ray_id, offsets, jnp.zeros((0,), table.dtype))


def _gather_rows_bwd(block, res, g):
    ray_id, offsets, dt_carrier = res
    return (seg_sum(g.astype(jnp.float32), offsets,
                    block).astype(dt_carrier.dtype), None, None)


gather_rows_sorted.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_flat_rows(packed, k_cols, ray_id, pos, offsets, block=SEG_BLOCK):
    """ONE row gather per flat sample fetching BOTH the per-ray geometry
    row ``packed`` (N, C) and the ray's padded rung-index row ``k_cols``
    (N, S, float32); the sample's rung is then selected from the gathered
    row at ``pos`` by a select-sum (a VPU stream) instead of a second
    B-element gather. Row-gather cost on this chip is per ROW regardless of
    width (docs/TPU_NOTES.md), so widening the row is free while the second
    gather cost ~8 ns/sample (~1 ms of the 1.7 ms flat-layout stage at the
    bench config, benchmarking/profile_stages.py r4).

    Same sortedness/consistency contract as :func:`gather_rows_sorted`
    (ray_id sorted, segment starts = offsets, content within ``block``
    slots). Backward: geometry columns get the scatter-free per-segment sum
    (:func:`seg_sum`); the rung indices are integers — no cotangent.

    Returns:
        (geo, k_f): (B, C) gathered geometry rows, (B,) int32 rung indices.
    """
    row = jnp.concatenate([packed, k_cols], axis=1)[ray_id]
    c = packed.shape[1]
    s = k_cols.shape[1]
    k_f = jnp.sum(jnp.where(pos[:, None] == jnp.arange(s, dtype=pos.dtype),
                            row[:, c:], 0.0), axis=1).astype(jnp.int32)
    return row[:, :c], k_f


def _gather_flat_fwd(packed, k_cols, ray_id, pos, offsets, block):
    out = gather_flat_rows(packed, k_cols, ray_id, pos, offsets, block)
    return out, (ray_id, offsets, jnp.zeros((0,), packed.dtype))


def _gather_flat_bwd(block, res, g):
    ray_id, offsets, dt_carrier = res
    g_geo, _ = g
    dpacked = seg_sum(g_geo.astype(jnp.float32), offsets,
                      block).astype(dt_carrier.dtype)
    return dpacked, None, None, None, None


gather_flat_rows.defvjp(_gather_flat_fwd, _gather_flat_bwd)


def seg_excl_cumsum(x, ray_id, offsets, n_rays=None, block=SEG_BLOCK):
    """Segment-exclusive prefix sum over a ray-ordered flat array.

    x: (B,) or (B, C); ray_id: (B,) sorted segment id per slot (must be
    consistent with ``offsets``: ray_id[i] = r iff offsets[r] <= i <
    offsets[r+1], tail padding assigned to the last ray). Implemented as
    ONE segmented associative scan (:func:`_segscan`) — EXACT for every
    slot and every segment length (no content-window precondition), with
    segment-local fp32 magnitudes by construction. ``offsets``/``n_rays``/
    ``block`` are unused by this implementation and kept for API
    compatibility with the blocked helpers (:func:`seg_sum`).

    Differentiable with the exact LINEAR custom adjoint: the transpose of
    the segment-exclusive prefix sum is the segment-exclusive SUFFIX sum,
    dx[i] = sum_{j>i in segment} g[j] — one reversed segmented scan. Exact
    for arbitrary cotangents (closing ADVICE r3's past-window-cotangent
    finding outright: there is no truncated window anymore). Autodiff of
    the scan would instead transpose its slice/concat lattice into a far
    larger program; the custom rule keeps the backward at one scan.
    """
    del n_rays, offsets, block
    return _seg_excl_vjp(x, ray_id)


@jax.custom_vjp
def _seg_excl_vjp(x, ray_id):
    return _segscan(x, _segment_flags(ray_id)) - x


def _seg_excl_fwd(x, ray_id):
    flags = _segment_flags(ray_id)
    return _segscan(x, flags) - x, flags


def _seg_excl_bwd(flags, g):
    return _segscan(g, flags, reverse=True) - g, None


_seg_excl_vjp.defvjp(_seg_excl_fwd, _seg_excl_bwd)


def _seg_excl_impl(x, ray_id, offsets, block):
    """Blocked (gather-based) segment-exclusive cumsum — SUPERSEDED by the
    segmented scan in :func:`seg_excl_cumsum` (measured 2.83 vs 0.47 ms at
    B=131072, benchmarking/probe_segscan.py). Retained as the probe's
    comparison point and as a second implementation for cross-checks; only
    exact within each segment's content window (see :data:`SEG_BLOCK`)."""
    loc, totals = _blocked_prefix(x, block)
    b = x.shape[0]
    nb = totals.shape[0]
    i = jnp.arange(b, dtype=jnp.int32)
    beg = offsets[ray_id]
    has_before = beg > 0
    j = jnp.maximum(beg - 1, 0)
    bb = jnp.where(has_before, j // block, 0)
    b_i = i // block
    c1 = b_i > bb
    c2 = b_i > bb + 1
    if x.ndim == 2:
        has_before = has_before[:, None]
        c1 = c1[:, None]
        c2 = c2[:, None]
    t1 = jnp.where(c1, totals[jnp.minimum(bb, nb - 1)], 0.0)
    t2 = jnp.where(c2, totals[jnp.minimum(bb + 1, nb - 1)], 0.0)
    base = jnp.where(has_before, loc[j], 0.0)
    return (t1 + t2) + ((loc - x) - base)


def composite_train_flat(sigmas, rgbs, deltas, ts, valid, ray_id, offsets,
                         n_rays, T_threshold=1e-4,
                         block=SEG_BLOCK) -> FlatCompositeResults:
    """Front-to-back compositing over FLAT ray-ordered samples.

    Identical math to :func:`composite_train` — transmittance before sample
    i is exp(-sum_{j<i in segment} sigma_j*delta_j), a segment-exclusive
    cumsum instead of a per-row cumprod — but evaluated only at the valid
    samples (the padded (N, S) rows evaluate every slot). Per-ray outputs
    come from the same cumsum via segment-boundary differences.

    Args:
        sigmas, deltas, ts: (B,) flat samples (ray-major contiguous).
        rgbs: (B, 3).
        valid: (B,) bool.
        ray_id: (B,) int32 segment id per sample.
        offsets: (N,) int32 exclusive segment start of each ray.
        n_rays: static N.
        block: static content-window bound (>= the per-ray sample cap that
            produced the flat layout; see :data:`SEG_BLOCK`).
    """
    # clamp per-sample optical depth: a trunc_exp overflow (sigma=inf in
    # fp32) would otherwise propagate inf-inf=NaN through the cumsum
    # algebra; e^-80 is 0 transmittance already, so this is exact
    sd = jnp.where(valid, sigmas.astype(jnp.float32)
                   * deltas.astype(jnp.float32), 0.0)
    sd = jnp.minimum(sd, 80.0)
    sd_excl = seg_excl_cumsum(sd, ray_id, offsets, n_rays, block)
    t_excl = jnp.exp(-sd_excl)
    alpha = 1.0 - jnp.exp(-sd)
    include = (t_excl > T_threshold) & valid
    w = jnp.where(include, alpha * t_excl, 0.0)

    # stack the per-sample columns so the structural gathers of the segment
    # helpers run ONCE over (B, C) rows instead of once per column (gather
    # cost is per row — the flat composite was 7.9 of the 17.4 ms step
    # before stacking, docs/TPU_NOTES.md)
    wm = w * ts
    cols = jnp.concatenate(
        [w[:, None], wm[:, None], w[:, None] * rgbs.astype(jnp.float32)],
        axis=1)                                                   # (B, 5)
    # seg_sum is a cumsum difference: cancellation can produce -epsilon,
    # which the opacity-entropy loss (o*log o) would turn into NaN
    sums = jnp.maximum(seg_sum_l(cols, ray_id, offsets, block), 0.0)  # (N,5)
    opacity, depth, rgb = sums[:, 0], sums[:, 1], sums[:, 2:5]
    excl2 = seg_excl_cumsum(jnp.stack([w, wm], axis=1), ray_id,
                            offsets, n_rays, block)               # (B, 2)
    w_excl, wm_excl = excl2[:, 0], excl2[:, 1]
    return FlatCompositeResults(
        opacity=opacity, depth=depth, rgb=rgb, ws=w, w_excl=w_excl,
        wm_excl=wm_excl, vr_samples=include.sum())


def composite_test_step_flat(sigmas, rgbs, deltas, ts, valid, ray_id,
                             offsets, opacity, depth, rgb, alive,
                             T_threshold, block=SEG_BLOCK):
    """Flat (ragged) variant of :func:`composite_test_step`: fold a block of
    ray-ordered FLAT samples into the persistent per-ray accumulators.

    Identical math — the per-row exclusive cumprod of (1 - alpha) becomes a
    segment-exclusive cumsum of sigma*delta in log space — but only the
    emitted samples are touched (the padded rows evaluate every slot).

    Args:
        sigmas, deltas, ts: (B,) flat samples, segments contiguous per ray.
        rgbs: (B, 3).
        valid: (B,) bool.
        ray_id: (B,) int32 ray of each sample; offsets: (N,) segment starts.
        opacity, depth, rgb, alive: per-ray accumulators as in
            :func:`composite_test_step`.
    Returns:
        (opacity, depth, rgb, alive) updated.
    """
    valid = valid & alive[ray_id]
    sd = jnp.where(valid, sigmas.astype(jnp.float32)
                   * deltas.astype(jnp.float32), 0.0)
    sd = jnp.minimum(sd, 80.0)  # inf-safety, see composite_train_flat
    sd_excl = seg_excl_cumsum(sd, ray_id, offsets, opacity.shape[0], block)
    t_start = 1.0 - opacity
    t_excl = t_start[ray_id] * jnp.exp(-sd_excl)
    alpha = 1.0 - jnp.exp(-sd)
    include = (t_excl > T_threshold) & valid
    w = jnp.where(include, alpha * t_excl, 0.0)

    # stacked columns: one structural pass for all per-ray accumulations
    cols = jnp.concatenate(
        [w[:, None], (w * ts)[:, None],
         w[:, None] * rgbs.astype(jnp.float32), sd[:, None]], axis=1)
    sums = seg_sum(cols, offsets, block)                          # (N, 6)
    opacity = opacity + sums[:, 0]
    depth = depth + sums[:, 1]
    rgb = rgb + sums[:, 2:5]

    t_final = t_start * jnp.exp(-sums[:, 5])
    alive = alive & (t_final > T_threshold)
    return opacity, depth, rgb, alive


def composite_test_step(sigmas, rgbs, deltas, ts, mask, opacity, depth, rgb,
                        alive, T_threshold):
    """One incremental compositing round for the alive-ray test renderer.

    Resumes each ray from its accumulated transmittance ``1 - opacity`` and
    folds a new block of samples into the persistent per-ray accumulators.
    Parity: composite_test_fw (volumerendering.cu:206-249); returning
    ``alive=False`` replaces the kernel's ``alive_indices[n] = -1``.

    Args:
        sigmas, rgbs, deltas, ts, mask: (N, S[,3]) new sample block.
        opacity, depth, rgb: (N,), (N,), (N,3) running accumulators.
        alive: (N,) bool rays still marching.
        T_threshold: convergence threshold.

    Returns:
        (opacity, depth, rgb, alive) updated.
    """
    mask = mask & alive[:, None]
    alpha = jnp.where(mask, 1.0 - jnp.exp(
        -sigmas.astype(jnp.float32) * deltas.astype(jnp.float32)), 0.0)
    one_minus = 1.0 - alpha
    t_start = (1.0 - opacity)[:, None]
    t_excl = t_start * jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[:, :1]),
                         one_minus[:, :-1]], axis=1), axis=1)
    include = (t_excl > T_threshold) & mask
    w = jnp.where(include, alpha * t_excl, 0.0)

    opacity = opacity + w.sum(axis=1)
    depth = depth + (w * ts).sum(axis=1)
    rgb = rgb + (w[..., None] * rgbs.astype(jnp.float32)).sum(axis=1)

    # a ray dies here when it converged (T <= threshold); the caller
    # additionally kills rays whose sample supply is exhausted (the
    # reference's N_eff_samples == 0 case, volumerendering.cu:222-225)
    t_final = t_excl[:, -1] * one_minus[:, -1]
    alive = alive & (t_final > T_threshold)
    return opacity, depth, rgb, alive
