"""Hand-written backward kernel for the fused EGCL layer + the custom-VJP
wrapper that makes the Pallas forward differentiable.

The XLA autodiff of the EGNN costs ~71ms/cloud at B=16 (its gather transposes
become serial scatter-adds); this backward mirrors the forward kernel's
structure instead — recompute the chunk's intermediates in VMEM, run the
chain rule as [rows, E] VPU/MXU ops, and turn BOTH scatter patterns into
matmuls:

    dh_rows (onto tile centers)   += dh_row @ Rᵀ
    dh_cols (onto any neighbor)   += dh_col · contract-E · O   (one-hot again)

Parameter gradients accumulate into revisited output blocks across the whole
grid (constant index maps; zeroed at the first program — the sequential TPU
grid makes this race-free).

The node-path backward (per-node dense MLP, no gathers) runs in XLA inside
the custom VJP — autodiff handles it well; the forward kernel only needs to
additionally expose agg_m (the pre-node-MLP message sums).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .egcl_kernel import EGCLParams, _cross_rows, _row

Array = jax.Array

_EPS = 1e-8
_DEGEN = 1e-6


def _silu(u):
    return u * jax.nn.sigmoid(u)


def _dsilu(u):
    s = jax.nn.sigmoid(u)
    return s * (1.0 + u * (1.0 - s))


def _normalize_bwd(r, n_safe, inv, da):
    """Backward of a = r·inv, inv = 1/(n+eps), n = sqrt(Σr²+1e-20)."""
    da_dot_r = jnp.sum(da * r, axis=0, keepdims=True)
    return da * inv - (inv * inv / n_safe) * da_dot_r * r


def _egcl_bwd_kernel(nbr_ref, ht_ref, xt_ref, dlm_ref, dlx_ref,
                     w1hr_ref, w1hc_ref, w1g_ref, b1_ref, w2_ref, b2_ref,
                     lns_ref, lnb_ref, wc0_ref, bc0_ref, wc1_ref,
                     # outputs
                     dh_ref, dx_ref,
                     dw1hr_ref, dw1hc_ref, dw1g_ref, db1_ref, dw2_ref, db2_ref,
                     dlns_ref, dlnb_ref, dwc0_ref, dbc0_ref, dwc1_ref,
                     *, T: int, E: int, K: int, N: int, C: int,
                     window: int | None = None, accurate: bool = False,
                     cast_bf16: bool = False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    f32 = jnp.float32

    first_program = (b == 0) & (i == 0) & (c == 0)
    first_for_batch = (i == 0) & (c == 0)

    @pl.when(first_for_batch)
    def _():
        dh_ref[0] = jnp.zeros_like(dh_ref[0])
        dx_ref[0] = jnp.zeros_like(dx_ref[0])

    @pl.when(first_program)
    def _():
        for ref in (dw1hr_ref, dw1hc_ref, dw1g_ref, db1_ref, dw2_ref, db2_ref,
                    dlns_ref, dlnb_ref, dwc0_ref, dbc0_ref, dwc1_ref):
            ref[:] = jnp.zeros_like(ref)

    h_tile = ht_ref[0, :, pl.ds(i * T, T)]
    x_tile = xt_ref[0, :, pl.ds(i * T, T)]
    dlm_tile = dlm_ref[0, :, pl.ds(i * T, T)]     # d(agg_m) per center [C, T]
    dlx_tile = dlx_ref[0, :, pl.ds(i * T, T)]     # d(agg_x) per center [3, T]

    # --- rebuild the chunk's maps and forward intermediates ---
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (T, E), 1)
    local_center = (c * E + e_ids) // K
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, E), 0)
    Rmat = (row_ids == local_center).astype(f32)

    nbr = nbr_ref[0]
    prec = (jax.lax.Precision.HIGHEST if accurate
            else jax.lax.Precision.DEFAULT)

    def dot(a_, b_):
        return jnp.dot(a_, b_, preferred_element_type=f32, precision=prec)

    dn = (((1,), (1,)), ((), ()))  # contract last axes (E with E)

    def dotT(a_, b_):   # a [r, E] x b [s, E] -> [r, s]
        return jax.lax.dot_general(a_, b_, dn, preferred_element_type=f32,
                                   precision=prec)

    # fast compiled mode casts the one-hot/gather operands to bf16 like the
    # forward kernel — bit-identical on TPU (DEFAULT-precision matmuls round
    # inputs to bf16 anyway) for ~half the VMEM->MXU operand traffic; the
    # one-hot's 0/1 values are exact in bf16 on both gather AND scatter sides
    gdt = jnp.bfloat16 if cast_bf16 else f32
    if window is not None:
        # curve-window gather/scatter — S(i) from the ONE shared definition
        # (ops/morton.window_start_at); h and x stack into ONE fused gather
        from ..morton import window_start_at
        S = window_start_at(i, T, N, window)
        n_ids = jax.lax.broadcasted_iota(jnp.int32, (window, E), 0) + S
        O = (n_ids == jnp.broadcast_to(nbr, (window, E))).astype(gdt)
        tab = jnp.concatenate([ht_ref[0, :, pl.ds(S, window)],
                               xt_ref[0, :, pl.ds(S, window)]], axis=0)
        hx = dot(tab.astype(gdt), O)
        h_col, x_col = hx[:C], hx[C:]
    else:
        n_ids = jax.lax.broadcasted_iota(jnp.int32, (N, E), 0)
        O = (n_ids == jnp.broadcast_to(nbr, (N, E))).astype(f32)
        h_col = dot(ht_ref[0], O)
        x_col = dot(xt_ref[0], O)
    hx_tile = jnp.concatenate([h_tile, x_tile], axis=0)
    hx_row = dot(hx_tile.astype(gdt), Rmat.astype(gdt))
    h_row, x_row = hx_row[:C], hx_row[C:]

    rel = x_row - x_col
    radial = jnp.sum(rel * rel, axis=0, keepdims=True)
    dist = jnp.sqrt(radial + 1e-20)
    dotf = jnp.sum(x_row * x_col, axis=0, keepdims=True)

    n_rel = jnp.sqrt(jnp.sum(rel * rel, axis=0, keepdims=True) + 1e-20)
    inv_rel = 1.0 / (n_rel + _EPS)
    a = rel * inv_rel
    cr = _cross_rows(x_row, x_col)
    n_cr = jnp.sqrt(jnp.sum(cr * cr, axis=0, keepdims=True) + 1e-20)
    inv_cr = 1.0 / (n_cr + _EPS)
    bvec = cr * inv_cr
    cvec = _cross_rows(a, bvec)

    c_n = jnp.sqrt(jnp.sum(cvec * cvec, axis=0, keepdims=True) + 1e-20)
    a_n = jnp.sqrt(jnp.sum(a * a, axis=0, keepdims=True) + 1e-20)
    b_n = jnp.sqrt(jnp.sum(bvec * bvec, axis=0, keepdims=True) + 1e-20)
    degen = ((a_n < _DEGEN) | (b_n < _DEGEN) | (c_n < _DEGEN))
    live = jnp.where(degen, 0.0, 1.0).astype(f32)    # [1, E]

    ident_rows = jax.lax.broadcasted_iota(jnp.int32, (9, E), 0)
    ident = jnp.where(ident_rows % 4 == 0, 1.0, 0.0).astype(f32)
    so3 = jnp.concatenate([
        _row(a, 0), _row(bvec, 0), _row(cvec, 0),
        _row(a, 1), _row(bvec, 1), _row(cvec, 1),
        _row(a, 2), _row(bvec, 2), _row(cvec, 2),
    ], axis=0)
    so3 = jnp.where(jnp.broadcast_to(degen, so3.shape), ident, so3)
    geo = jnp.concatenate([radial, dist, dotf, so3], axis=0)

    u = (dot(w1hr_ref[:], h_row) + dot(w1hc_ref[:], h_col)
         + dot(w1g_ref[:], geo) + b1_ref[:])
    s1 = _silu(u)
    v = dot(w2_ref[:], s1) + b2_ref[:]
    mu = jnp.mean(v, axis=0, keepdims=True)
    var = jnp.mean((v - mu) ** 2, axis=0, keepdims=True)
    sigma_inv = jax.lax.rsqrt(var + 1e-5)
    vhat = (v - mu) * sigma_inv
    m = vhat * lns_ref[:] + lnb_ref[:]

    cm_in = dot(wc0_ref[:], m) + bc0_ref[:]
    cm = _silu(cm_in)
    scale = dot(wc1_ref[:], cm)                      # [1, E]

    # --- cotangents flowing into the edge program ---
    dm = dot(dlm_tile, Rmat)                         # node path: dagg_m[i(e)]
    dax = dot(dlx_tile, Rmat)                        # [3, E] d(agg_x)[i(e)]
    dscale = jnp.sum(dax * rel, axis=0, keepdims=True)
    drel_coord = dax * scale

    # coord MLP backward
    dcm = dot(wc1_ref[:].T, dscale)                      # [C, E]
    dcm_in = _dsilu(cm_in) * dcm
    dm = dm + dot(wc0_ref[:].T, dcm_in)
    dwc1_ref[:] += dotT(dscale, cm)
    dwc0_ref[:] += dotT(dcm_in, m)
    dbc0_ref[:] += jnp.sum(dcm_in, axis=1, keepdims=True)

    # LayerNorm backward (over the C sublanes)
    dlns_ref[:] += jnp.sum(dm * vhat, axis=1, keepdims=True)
    dlnb_ref[:] += jnp.sum(dm, axis=1, keepdims=True)
    g = dm * lns_ref[:]
    dv = sigma_inv * (g - jnp.mean(g, axis=0, keepdims=True)
                      - vhat * jnp.mean(g * vhat, axis=0, keepdims=True))

    dw2_ref[:] += dotT(dv, s1)
    db2_ref[:] += jnp.sum(dv, axis=1, keepdims=True)
    ds1 = dot(w2_ref[:].T, dv)
    du = _dsilu(u) * ds1

    dw1hr_ref[:] += dotT(du, h_row)
    dw1hc_ref[:] += dotT(du, h_col)
    dw1g_ref[:] += dotT(du, geo)
    db1_ref[:] += jnp.sum(du, axis=1, keepdims=True)

    dh_row = dot(w1hr_ref[:].T, du)                      # [C, E]
    dh_col = dot(w1hc_ref[:].T, du)
    dgeo = dot(w1g_ref[:].T, du)                         # [12, E]

    dradial = _row(dgeo, 0)
    ddist = _row(dgeo, 1)
    ddot = _row(dgeo, 2)
    dso3 = dgeo[3:12, :] * live                      # degenerate → constant

    da = jnp.concatenate([_row(dso3, 0), _row(dso3, 3), _row(dso3, 6)], axis=0)
    db_ = jnp.concatenate([_row(dso3, 1), _row(dso3, 4), _row(dso3, 7)], axis=0)
    dc_ = jnp.concatenate([_row(dso3, 2), _row(dso3, 5), _row(dso3, 8)], axis=0)

    # c = a x b contributions
    da = da + _cross_rows(bvec, dc_)
    db_ = db_ + _cross_rows(dc_, a)

    # b = normalize(cross(x_row, x_col))
    dcr = _normalize_bwd(cr, n_cr, inv_cr, db_)
    dx_row_cr = _cross_rows(x_col, dcr)
    dx_col_cr = _cross_rows(dcr, x_row)

    # a = normalize(rel)
    drel_a = _normalize_bwd(rel, n_rel, inv_rel, da)

    drel = (drel_coord + drel_a
            + 2.0 * rel * dradial
            + (rel / dist) * ddist)
    dx_row_e = drel + x_col * ddot + dx_row_cr
    dx_col_e = -drel + x_row * ddot + dx_col_cr

    # --- scatter-free accumulation back to nodes (h and x fused into one
    # [C+3, ...] matmul per one-hot, mirroring the fused gathers) ---
    # rows (centers of this tile): slice-accumulate into the [C, N] buffer
    dhx_row = dotT(jnp.concatenate([dh_row, dx_row_e], axis=0).astype(gdt),
                   Rmat.astype(gdt))
    dh_ref[0, :, pl.ds(i * T, T)] += dhx_row[:C]
    dx_ref[0, :, pl.ds(i * T, T)] += dhx_row[C:]
    # cols (neighbors): contract E against the one-hot — window mode only
    # touches the window slice (all of this chunk's neighbors live there)
    dhx_col = dotT(jnp.concatenate([dh_col, dx_col_e], axis=0).astype(gdt), O)
    if window is not None:
        dh_ref[0, :, pl.ds(S, window)] += dhx_col[:C]
        dx_ref[0, :, pl.ds(S, window)] += dhx_col[C:]
    else:
        dh_ref[0] += dhx_col[:C]
        dx_ref[0] += dhx_col[C:]


@functools.partial(jax.jit, static_argnames=("tile_t", "chunk", "interpret",
                                              "window", "accurate"))
def egcl_backward_pallas(h: Array, x: Array, nbr_idx: Array, params: EGCLParams,
                         dagg_m: Array, dagg_x: Array,
                         tile_t: int = 128, chunk: int = 512,
                         interpret: bool = False,
                         window: int | None = None,
                         accurate: bool = False):
    """Edge-program backward. h [B,C,N], x [B,3,N] are the LAYER INPUTS;
    dagg_m [B,C,N], dagg_x [B,3,N] are cotangents of the aggregated messages /
    coordinate updates. Returns (dh, dx, EGCLParams gradients) where dh/dx are
    the edge-path input cotangents (node-path terms are added by the caller).
    """
    bsz, c_dim, n = h.shape
    k = nbr_idx.shape[-1]
    T = tile_t
    tk = T * k
    E = min(chunk, tk)
    assert n % T == 0 and tk % E == 0
    nbr_flat = nbr_idx.reshape(bsz, 1, n * k).astype(jnp.int32)
    grid = (bsz, n // T, tk // E)

    def const_spec(p):
        return pl.BlockSpec(p.shape, lambda bb, ii, cc: (0,) * p.ndim,
                            memory_space=pltpu.VMEM)

    p = params
    kernel = functools.partial(_egcl_bwd_kernel, T=T, E=E, K=k, N=n, C=c_dim,
                               window=window, accurate=accurate,
                               cast_bf16=not accurate and not interpret)
    full = lambda shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    out_shapes = [full((bsz, c_dim, n)), full((bsz, 3, n))] + \
        [full(q.shape) for q in (p.w1_hrow, p.w1_hcol, p.w1_geo, p.b1, p.w2,
                                 p.b2, p.ln_scale, p.ln_bias, p.wc0, p.bc0,
                                 p.wc1)]
    out_specs = [
        pl.BlockSpec((1, c_dim, n), lambda bb, ii, cc: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n), lambda bb, ii, cc: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [const_spec(q) for q in (p.w1_hrow, p.w1_hcol, p.w1_geo, p.b1, p.w2,
                                 p.b2, p.ln_scale, p.ln_bias, p.wc0, p.bc0,
                                 p.wc1)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, E),
                         lambda bb, ii, cc, tk_=tk, E_=E: (bb, 0, (ii * tk_ // E_) + cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_dim, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_dim, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda bb, ii, cc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(q) for q in (p.w1_hrow, p.w1_hcol, p.w1_geo, p.b1,
                                     p.w2, p.b2, p.ln_scale, p.ln_bias,
                                     p.wc0, p.bc0, p.wc1)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(nbr_flat, h, x, dagg_m, dagg_x, p.w1_hrow, p.w1_hcol, p.w1_geo, p.b1,
      p.w2, p.b2, p.ln_scale, p.ln_bias, p.wc0, p.bc0, p.wc1)

    dh, dx = outs[0], outs[1]
    dparams = EGCLParams(
        w1_hrow=outs[2], w1_hcol=outs[3], w1_geo=outs[4], b1=outs[5],
        w2=outs[6], b2=outs[7], ln_scale=outs[8], ln_bias=outs[9],
        wc0=outs[10], bc0=outs[11], wc1=outs[12],
        wn0=jnp.zeros_like(p.wn0), bn0=jnp.zeros_like(p.bn0),
        wn1=jnp.zeros_like(p.wn1), bn1=jnp.zeros_like(p.bn1),
    )
    return dh, dx, dparams


# ---------------------------------------------------------------------------
# Differentiable fused layer: Pallas forward + Pallas backward
# ---------------------------------------------------------------------------

def _node_forward(h, agg_m, params: EGCLParams, accurate: bool = False):
    """Node-path MLP in transposed layout (runs in XLA inside the VJP —
    per-node dense ops, no gathers)."""
    prec = (jax.lax.Precision.HIGHEST if accurate
            else jax.lax.Precision.DEFAULT)
    hcat = jnp.concatenate([h, agg_m], axis=1)               # [B, 2C, N]
    out = jnp.einsum("co,boN->bcN", params.wn0, hcat, precision=prec) + params.bn0
    out = _silu(out)
    out = jnp.einsum("co,boN->bcN", params.wn1, out, precision=prec) + params.bn1
    return h + out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def egcl_fused_diff(h, x, nbr_idx, params: EGCLParams,
                    tile_t: int = 128, chunk: int = 512,
                    interpret: bool = False,
                    window: int | None = None,
                    accurate: bool = False):
    """Differentiable fused EGCL layer (transposed layout h [B,C,N], x [B,3,N]).

    Forward = the Pallas forward kernel; backward = the hand-written Pallas
    edge-program backward + XLA node-path autodiff. `accurate` selects 3-pass
    ~fp32 matmuls in BOTH directions (vs 1-pass bf16 fast mode). `window`
    enables the curve-window gather/scatter in BOTH kernels (the graph must
    come from ops/morton.knn_graph_window).
    """
    from .egcl_kernel import egcl_layer_pallas
    # primal (inference) path: agg_m is only needed by the VJP forward
    # (_fused_fwd) — emitting it here would write a dead [B,C,N] buffer
    # to HBM per layer on every no-grad call
    h_out, x_out = egcl_layer_pallas(
        h, x, nbr_idx, params, tile_t=tile_t, chunk=chunk,
        interpret=interpret, accurate=accurate, emit_aggm=False, window=window)
    return h_out, x_out


def _fused_fwd(h, x, nbr_idx, params, tile_t, chunk, interpret, window,
               accurate):
    from .egcl_kernel import egcl_layer_pallas
    h_out, x_out, agg_m = egcl_layer_pallas(
        h, x, nbr_idx, params, tile_t=tile_t, chunk=chunk,
        interpret=interpret, accurate=accurate, emit_aggm=True, window=window)
    return (h_out, x_out), (h, x, nbr_idx, params, agg_m)


def _fused_bwd(tile_t, chunk, interpret, window, accurate, res, cot):
    h, x, nbr_idx, params, agg_m = res
    dh_out, dx_out = cot

    # node path via XLA autodiff (dense per-node MLP)
    node_params = (params.wn0, params.bn0, params.wn1, params.bn1)

    def node_fn(h_, agg_m_, np_):
        p = params._replace(wn0=np_[0], bn0=np_[1], wn1=np_[2], bn1=np_[3])
        return _node_forward(h_, agg_m_, p, accurate=accurate)

    _, node_vjp = jax.vjp(node_fn, h, agg_m, node_params)
    dh_node, dagg_m, dnode_params = node_vjp(dh_out)

    # coordinate residual: x_out = x + agg_x
    dagg_x = dx_out

    # Edge-chunk cap: accurate (3-pass) mode keeps ~3x more live [*, E]
    # intermediates and OOMs VMEM beyond 256 lanes. Fast WINDOW mode runs the
    # full tile in one chunk like the forward — its one-hot is only
    # [window, E] bf16, and measured on v5e the full-tile chunk is ~32%
    # faster than 512-lane chunks (11.4 -> 7.8 ms/layer-cloud at B=64,
    # N=2048, W=384: fewer recompute passes per tile). The full-TABLE fast
    # path keeps 512 — its one-hot is [N, E] and would blow VMEM at 2048.
    if accurate:
        if window is not None:
            # measured on v5e (B=16, W=384, N=2048): 256-lane chunks 9.2 ms,
            # 512 -> 7.7, 1024 -> 7.5 per layer-cloud; 2048 fails to compile
            # (3-pass intermediates exceed VMEM). The forward keeps 256.
            # Must also DIVIDE tile_t*K (the kernel's chunking invariant) —
            # e.g. k=12 gives tk=1536 where a flat 1024 cap would not.
            tk = tile_t * nbr_idx.shape[-1]
            bwd_chunk = tk
            while bwd_chunk > 1024 or tk % bwd_chunk:
                bwd_chunk //= 2
        else:
            bwd_chunk = min(chunk, 256)
    elif window is not None:
        bwd_chunk = chunk
    else:
        bwd_chunk = min(chunk, 512)
    dh_edge, dx_edge, dparams = egcl_backward_pallas(
        h, x, nbr_idx, params, dagg_m, dagg_x,
        tile_t=tile_t, chunk=bwd_chunk,
        interpret=interpret, window=window, accurate=accurate)

    dh = dh_node + dh_edge
    dx = dx_out + dx_edge
    dparams = dparams._replace(wn0=dnode_params[0], bn0=dnode_params[1],
                               wn1=dnode_params[2], bn1=dnode_params[3])
    return dh, dx, None, dparams


egcl_fused_diff.defvjp(_fused_fwd, _fused_bwd)
