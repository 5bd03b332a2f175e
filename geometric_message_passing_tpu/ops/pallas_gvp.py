"""Fused Pallas TPU kernel for the GVP-GNN message pass.

The GVPConv message (reference: gvp_layer.py:246-324) is a 3-deep chain of
geometric vector perceptrons over every edge: gather endpoint tuples, run
GVP x3 (each = 2 vector GEMMs + a norm + a scalar GEMM + a vector-gate GEMM
+ 2 sigmoids), then a masked segment-MEAN back to nodes.  As separate XLA
ops that is ~30 kernels/layer; at our graph sizes the hot loop is
kernel-launch-bound (CLAUDE.md), so the whole thing runs here as ONE
pallas_call per direction (fwd / bwd).

Layout: vector channels are carried as three component planes vx/vy/vz of
shape [*, nv] — every op in the chain becomes a plain 2-D GEMM/elementwise
on the MXU/VPU lanes; no [*, nv, 3] relayouts inside the kernel.  Gathers
and segment sums are one-hot matmuls (same trick as ops/pallas_edge.py).

The backward kernel recomputes the block's forward in VMEM and gets its
transpose math from ``jax.vjp`` *inside* the kernel body (traced like any
other jnp code), so fwd/bwd numerics can never drift apart.

XLA twin (``gvp_message_xla``) provides the correctness reference and the
CPU/test path.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_edge import _is_cpu

# per-GVP weight tuple: (Wh [vi,h], Wv [h,vo], Ws [si+h,so], bs [1,so],
#                        Wsv [so,vo], bsv [1,vo])
N_W = 6


def gvp_chain(s, vx, vy, vz, weights: Sequence, n_layers: int):
    """The GVP chain on component planes.  Exactly the math of
    nn/gvp.py::GVP (vector_gate=True, act relu/sigmoid, last layer linear),
    with norm_no_nan's clip-eps semantics."""
    # ROUND-3 RELAYOUT: the three component planes are stacked ROW-wise
    # into one [3E, nv] operand for the Wh/Wv GEMMs (one dot each instead
    # of three 16-wide dots) — per-row results are identical, but the MXU
    # sees 3x the rows per launch instead of three narrow GEMMs wasting
    # lanes (the round-2 lead from RESULTS.md's fused-GVP verdict).
    for k in range(n_layers):
        Wh, Wv, Ws, bs, Wsv, bsv = weights[k * N_W : (k + 1) * N_W]
        last = k == n_layers - 1
        E = s.shape[0]
        v_all = jnp.concatenate([vx, vy, vz], axis=0)       # [3E, vi]
        vh_all = v_all @ Wh                                 # ONE GEMM
        vhx, vhy, vhz = vh_all[:E], vh_all[E : 2 * E], vh_all[2 * E :]
        q = vhx * vhx + vhy * vhy + vhz * vhz
        vn = jnp.sqrt(jnp.clip(q, min=1e-8))
        spre = jnp.concatenate([s, vn], axis=-1) @ Ws + bs
        vo_all = vh_all @ Wv                                # ONE GEMM
        gate_in = spre if last else jax.nn.sigmoid(spre)
        g = jax.nn.sigmoid(gate_in @ Wsv + bsv)
        v_all = vo_all * jnp.concatenate([g, g, g], axis=0)
        vx, vy, vz = v_all[:E], v_all[E : 2 * E], v_all[2 * E :]
        s = spre if last else jnp.maximum(spre, 0.0)
    return s, vx, vy, vz


def _edge_block_fn(oh_send, oh_recv, emask, n_layers):
    """Returns f(node/edge features, *weights) -> masked segment sums for one
    edge block — differentiable, shared by fwd kernel, bwd vjp and XLA twin
    assembly."""

    def f(s, vx, vy, vz, es, evx, evy, evz, *ws):
        mm = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # ROUND-3 RELAYOUT: gather [s | vx | vy | vz] through ONE wide
        # one-hot GEMM per endpoint (2 dots instead of 8 narrow ones — the
        # 16-wide vector-plane gathers wasted MXU lanes), and reduce the
        # concatenated message planes through ONE dot instead of 4.
        so, nv = s.shape[1], vx.shape[1]
        feat = jnp.concatenate([s, vx, vy, vz], axis=-1)    # [N, so+3nv]
        f_j, f_i = mm(oh_send, feat), mm(oh_recv, feat)
        sl = lambda f, k: f[:, so + k * nv : so + (k + 1) * nv]
        # tuple_cat((s_j, V_j), edge, (s_i, V_i))  (gvp_layer.py:304-311)
        s_cat = jnp.concatenate([f_j[:, :so], es, f_i[:, :so]], axis=-1)
        cx = jnp.concatenate([sl(f_j, 0), evx, sl(f_i, 0)], axis=-1)
        cy = jnp.concatenate([sl(f_j, 1), evy, sl(f_i, 1)], axis=-1)
        cz = jnp.concatenate([sl(f_j, 2), evz, sl(f_i, 2)], axis=-1)
        ms, mvx, mvy, mvz = gvp_chain(s_cat, cx, cy, cz, ws, n_layers)
        ohT = oh_recv * emask[:, None]
        m_all = jnp.concatenate([ms, mvx, mvy, mvz], axis=-1)
        r = jax.lax.dot_general(
            ohT, m_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mo = ms.shape[1]
        wv = mvx.shape[1]
        return (r[:, :mo], r[:, mo : mo + wv],
                r[:, mo + wv : mo + 2 * wv], r[:, mo + 2 * wv :])

    return f


def _onehots(send, recv, n):
    oh_send = (
        send[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)
    oh_recv = (
        recv[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    ).astype(jnp.float32)
    return oh_send, oh_recv


def _gvp_fwd_kernel(send_ref, recv_ref, emask_ref,
                    s_ref, vx_ref, vy_ref, vz_ref,
                    es_ref, evx_ref, evy_ref, evz_ref,
                    *rest, n_layers):
    w_refs, out_refs = rest[: n_layers * N_W], rest[n_layers * N_W :]
    s_acc, vx_acc, vy_acc, vz_acc, cnt_acc = out_refs
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for o in out_refs:
            o[...] = jnp.zeros_like(o)

    emask = emask_ref[...].astype(jnp.float32)
    oh_send, oh_recv = _onehots(send_ref[...], recv_ref[...],
                                s_ref.shape[0])
    f = _edge_block_fn(oh_send, oh_recv, emask, n_layers)
    ds, dvx, dvy, dvz = f(
        s_ref[...], vx_ref[...], vy_ref[...], vz_ref[...],
        es_ref[...], evx_ref[...], evy_ref[...], evz_ref[...],
        *[w[...] for w in w_refs],
    )
    s_acc[...] += ds
    vx_acc[...] += dvx
    vy_acc[...] += dvy
    vz_acc[...] += dvz
    cnt_acc[...] += jnp.sum(oh_recv * emask[:, None], axis=0)[:, None]


def _gvp_bwd_kernel(send_ref, recv_ref, emask_ref,
                    s_ref, vx_ref, vy_ref, vz_ref,
                    es_ref, evx_ref, evy_ref, evz_ref,
                    *rest, n_layers):
    nw = n_layers * N_W
    w_refs = rest[:nw]
    gs_ref, gvx_ref, gvy_ref, gvz_ref = rest[nw : nw + 4]
    out_refs = rest[nw + 4 :]
    (ds_acc, dvx_acc, dvy_acc, dvz_acc,
     des_out, devx_out, devy_out, devz_out) = out_refs[:8]
    dw_accs = out_refs[8:]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for o in (ds_acc, dvx_acc, dvy_acc, dvz_acc) + tuple(dw_accs):
            o[...] = jnp.zeros_like(o)

    emask = emask_ref[...].astype(jnp.float32)
    oh_send, oh_recv = _onehots(send_ref[...], recv_ref[...],
                                s_ref.shape[0])
    f = _edge_block_fn(oh_send, oh_recv, emask, n_layers)
    args = (s_ref[...], vx_ref[...], vy_ref[...], vz_ref[...],
            es_ref[...], evx_ref[...], evy_ref[...], evz_ref[...],
            *[w[...] for w in w_refs])
    # the fwd output is a sum over edge blocks, so every block's vjp sees the
    # same (full, node-level) cotangent
    _, vjp = jax.vjp(f, *args)
    grads = vjp((gs_ref[...], gvx_ref[...], gvy_ref[...], gvz_ref[...]))
    ds, dvx, dvy, dvz, des, devx, devy, devz = grads[:8]
    ds_acc[...] += ds
    dvx_acc[...] += dvx
    dvy_acc[...] += dvy
    dvz_acc[...] += dvz
    des_out[...] = des       # per-block edge grads: write, not accumulate
    devx_out[...] = devx
    devy_out[...] = devy
    devz_out[...] = devz
    for acc, dw in zip(dw_accs, grads[8:]):
        acc[...] += dw


def _pad_edges(arrs_1d, arrs_2d, be):
    e = arrs_1d[0].shape[0]
    pad = (-e) % be
    if pad:
        arrs_1d = [jnp.pad(a, (0, pad)) for a in arrs_1d]
        arrs_2d = [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs_2d]
    return arrs_1d, arrs_2d, (e + pad) // be


def gvp_message_xla(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz,
                    weights: Sequence, n_layers: int, seg_plans=None):
    """XLA twin: identical math via advanced indexing + segment sums.

    ``seg_plans`` (round 5, VERDICT item 6): optional sorted segment-tile
    plans ({'rcv','snd'}, ops/pallas_sorted_segsum.py) — the wide merged
    reduction (the [E, so+3v+1] segment sum below, GVP's single biggest
    scatter) runs through the tiled sorted-segment Pallas kernel, and the
    send-side endpoint gather's BACKWARD scatter-add does too."""
    from .scatter import segment_sum

    n = s.shape[0]
    # ROUND-3 RELAYOUT: one wide gather per endpoint and ONE wide masked
    # segment reduction (with the count as an extra ones column) instead of
    # 8 narrow gathers + 5 narrow one-hot reduction GEMMs.
    so, nv = s.shape[1], vx.shape[1]
    feat = jnp.concatenate([s, vx, vy, vz], axis=-1)
    if seg_plans is not None:
        from .pallas_sorted_segsum import sorted_gather, sorted_segment_sum

        (s_perm, s_starts, s_local, s_cfg) = seg_plans["snd"]
        f_j = sorted_gather(feat, send, s_perm, s_starts, s_local,
                            emask, s_cfg)
    else:
        f_j = feat[send]
    f_i = feat[recv]
    sl = lambda f, k: f[:, so + k * nv : so + (k + 1) * nv]
    s_cat = jnp.concatenate([f_j[:, :so], es, f_i[:, :so]], axis=-1)
    cx = jnp.concatenate([sl(f_j, 0), evx, sl(f_i, 0)], axis=-1)
    cy = jnp.concatenate([sl(f_j, 1), evy, sl(f_i, 1)], axis=-1)
    cz = jnp.concatenate([sl(f_j, 2), evz, sl(f_i, 2)], axis=-1)
    ms, mvx, mvy, mvz = gvp_chain(s_cat, cx, cy, cz, list(weights), n_layers)
    ones = jnp.ones((send.shape[0], 1), s.dtype)
    m_all = jnp.concatenate([ms, mvx, mvy, mvz, ones], axis=-1)
    if seg_plans is not None:
        (r_perm, r_starts, r_local, r_cfg) = seg_plans["rcv"]
        r = sorted_segment_sum(m_all, r_perm, r_starts, r_local, recv,
                               emask, r_cfg)
    else:
        r = segment_sum(m_all, recv, n, mask=emask)
    mo, wv = ms.shape[1], mvx.shape[1]
    return (r[:, :mo], r[:, mo : mo + wv], r[:, mo + wv : mo + 2 * wv],
            r[:, mo + 2 * wv : mo + 3 * wv], r[:, mo + 3 * wv :])


def make_gvp_message_fused(dims: Tuple[Tuple[int, int], ...],
                           n_layers: int = 3,
                           block_edges: int = 1024,
                           interpret: bool = False,
                           pallas_bwd: bool = True):
    """Fused GVPConv message as a custom_vjp closure.

    ``dims``: ((si_cat, vi_cat), (so, vo)) of the chain's in/out tuple dims
    (layer 0 maps in->out, the rest out->out), used only for shape checks.

    Signature of the returned fn:
      (send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, *weights)
      -> (s_sum [N,so], vx_sum, vy_sum, vz_sum [N,vo], cnt [N,1])
    Mean aggregation = sums / max(cnt, 1) at the caller.
    """
    del dims  # shapes are carried by the operands

    def _run_fwd(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, ws):
        if _is_cpu() and not interpret:
            return gvp_message_xla(send, recv, emask, s, vx, vy, vz,
                                   es, evx, evy, evz, ws, n_layers)
        n, so = s.shape[0], ws[(n_layers - 1) * N_W + 2].shape[1]
        vo = ws[(n_layers - 1) * N_W + 1].shape[1]
        be = max(1024, block_edges)
        (send_p, recv_p, emask_p), e2d, steps = _pad_edges(
            [send, recv, emask], [es, evx, evy, evz], be)
        es_p, evx_p, evy_p, evz_p = e2d
        kernel = functools.partial(_gvp_fwd_kernel, n_layers=n_layers)
        espec = lambda a: pl.BlockSpec((be, a.shape[1]), lambda i: (i, 0))
        full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((be,), lambda i: (i,)),
                pl.BlockSpec((be,), lambda i: (i,)),
                pl.BlockSpec((be,), lambda i: (i,)),
                full(s), full(vx), full(vy), full(vz),
                espec(es_p), espec(evx_p), espec(evy_p), espec(evz_p),
            ] + [full(w) for w in ws],
            out_specs=tuple(
                pl.BlockSpec(shp, lambda i: (0, 0))
                for shp in [(n, so), (n, vo), (n, vo), (n, vo), (n, 1)]
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct(shp, jnp.float32)
                for shp in [(n, so), (n, vo), (n, vo), (n, vo), (n, 1)]
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret or _is_cpu(),
        )(send_p, recv_p, emask_p, s, vx, vy, vz,
          es_p, evx_p, evy_p, evz_p, *ws)

    def _run_bwd(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, ws, g):
        gs, gvx, gvy, gvz, _gcnt = g   # cnt: no differentiable path
        n = s.shape[0]
        e = send.shape[0]
        be = max(1024, block_edges)
        (send_p, recv_p, emask_p), e2d, steps = _pad_edges(
            [send, recv, emask], [es, evx, evy, evz], be)
        es_p, evx_p, evy_p, evz_p = e2d
        kernel = functools.partial(_gvp_bwd_kernel, n_layers=n_layers)
        espec = lambda a: pl.BlockSpec((be, a.shape[1]), lambda i: (i, 0))
        full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
        node_shapes = [s.shape, vx.shape, vy.shape, vz.shape]
        edge_shapes = [es_p.shape, evx_p.shape, evy_p.shape, evz_p.shape]
        w_shapes = [w.shape for w in ws]
        outs = pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((be,), lambda i: (i,)),
                pl.BlockSpec((be,), lambda i: (i,)),
                pl.BlockSpec((be,), lambda i: (i,)),
                full(s), full(vx), full(vy), full(vz),
                espec(es_p), espec(evx_p), espec(evy_p), espec(evz_p),
            ] + [full(w) for w in ws]
            + [full(gs), full(gvx), full(gvy), full(gvz)],
            out_specs=tuple(
                [pl.BlockSpec(shp, lambda i: (0, 0)) for shp in node_shapes]
                + [pl.BlockSpec((be, shp[1]), lambda i: (i, 0))
                   for shp in edge_shapes]
                + [pl.BlockSpec(shp, lambda i: (0,) * len(shp))
                   for shp in w_shapes]
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct(shp, jnp.float32)
                for shp in node_shapes + edge_shapes + w_shapes
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret or _is_cpu(),
        )(send_p, recv_p, emask_p, s, vx, vy, vz,
          es_p, evx_p, evy_p, evz_p, *ws, gs, gvx, gvy, gvz)
        ds, dvx, dvy, dvz = outs[:4]
        des, devx, devy, devz = [o[:e] for o in outs[4:8]]
        dws = outs[8:]
        return ds, dvx, dvy, dvz, des, devx, devy, devz, dws

    @jax.custom_vjp
    def fused(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, *ws):
        return _run_fwd(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz,
                        list(ws))

    def fwd(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, *ws):
        out = _run_fwd(send, recv, emask, s, vx, vy, vz, es, evx, evy, evz,
                       list(ws))
        return out, (send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, ws)

    def bwd(res, g):
        send, recv, emask, s, vx, vy, vz, es, evx, evy, evz, ws = res
        use_pallas = pallas_bwd and not (_is_cpu() and not interpret)
        if use_pallas:
            ds, dvx, dvy, dvz, des, devx, devy, devz, dws = _run_bwd(
                send, recv, emask, s, vx, vy, vz, es, evx, evy, evz,
                list(ws), g)
        else:
            _, vjp = jax.vjp(
                lambda s_, vx_, vy_, vz_, es_, evx_, evy_, evz_, *ws_:
                gvp_message_xla(send, recv, emask, s_, vx_, vy_, vz_,
                                es_, evx_, evy_, evz_, list(ws_), n_layers),
                s, vx, vy, vz, es, evx, evy, evz, *ws,
            )
            grads = vjp(g)
            ds, dvx, dvy, dvz, des, devx, devy, devz = grads[:8]
            dws = grads[8:]
        return (None, None, None, ds, dvx, dvy, dvz,
                des, devx, devy, devz, *dws)

    fused.defvjp(fwd, bwd)
    return fused
