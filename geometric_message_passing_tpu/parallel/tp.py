"""Mul-sharded tensor parallelism for MACE (SURVEY §2.5: "shard irrep channel
multiplicities of TP weights across chips").

Design (Megatron row-parallelism mapped to irrep multiplicities):

  * every feature tensor is sharded on its CHANNEL (mul) axis: shard p of k
    holds channels [p*mul/k, (p+1)*mul/k) of every irrep;
  * channel-wise ops (radial/SH edge features, SymmetricContraction,
    equivariant BatchNorm, gathers/scatters, pooling) run fully locally;
  * channel-MIXING ops (the edge tensor product's [u,w] weight contraction,
    IrrepsLinear, the invariant readout's first Dense) are row-parallel:
    local-mul input x full-mul weights -> partial full output -> one psum
    over the tp axis -> slice back to the local shard.

Communication per MACE layer: two [N, hidden.dim] psums (conv + product
linear) + one [G, emb] psum at the readout — O(N·d), independent of edge
count, riding ICI.  The numerics are EXACTLY the single-device model's
(same fan-in normalization via path_weight_scale / fan_mult); equivalence is
tested on a CPU mesh in tests/test_parallel.py.

The reference has no parallelism of any kind (no torch.distributed import
anywhere); this subsystem is designed from scratch per the BASELINE.json
north star.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..irreps import Irreps
from ..nn.tensor_product import EdgeTensorProduct
from .mesh import collectives


def tp_local_model(model, tp_size: int, axis: str = "tp"):
    """The per-shard module for a full MACEModel: local emb width, psums on
    the mixing ops."""
    assert model.emb_dim % tp_size == 0, (model.emb_dim, tp_size)
    kw = dict(emb_dim=model.emb_dim // tp_size, tp_axis=axis,
              tp_size=tp_size)
    if getattr(model, "hidden_irreps", None) is not None:
        hid = Irreps(model.hidden_irreps)
        assert all(mul % tp_size == 0 for mul, _ in hid), (hid, tp_size)
        kw["hidden_irreps"] = str(
            Irreps([(mul // tp_size, ir) for mul, ir in hid]))
    return model.clone(**kw)


def _fc_group_weight_cols(model, layer: int, group: int, tp_size: int,
                          shard: int) -> np.ndarray:
    """Column indices of the full edge-MLP group-``group`` head kernel that
    belong to ``shard`` (identity-entry-map case; kept for MACE's direct
    layout where local and full TP groups correspond 1:1): for every TP path
    in the group, the weight block is [mul_in, mul_out] row-major, and a
    shard owns the rows of its input channels (row-parallel over the irrep
    multiplicity)."""
    _, cols = _conv_head_cols(model, layer, tp_size, shard)[group]
    return cols


def _conv_tp_pair(model, layer: int, tp_size: int):
    """(full_tp, local_tp, entry_map) for conv layer ``layer`` of a
    TensorProductConvLayer-stack model (MACE, TFN).

    ``full_tp`` is the single-device model's edge TP; ``local_tp`` is the TP
    a 1/k mul-shard builds (local-mul inputs -> FULL-mul outputs, i.e. the
    layer's ``_tp_out_full``); ``entry_map[i_out_local] = (i_out_full,
    col_offset)`` locates each local output entry inside the full model's
    output entries.  The map is non-trivial exactly when the model gates:
    the full model's gate scalars simplify into ONE 0e entry while the
    sharded layer keeps one gates entry PER gated irrep (nn/conv.py setup),
    so a local gates entry maps into a column RANGE of the merged full
    entry."""
    from ..nn.equivariant import irreps2gate, scale_mul

    sh_irreps = Irreps.spherical_harmonics(model.max_ell)
    hid_f = (
        Irreps(model.hidden_irreps) if model.hidden_irreps is not None
        else (sh_irreps * model.emb_dim).sort().simplify()
    )
    assert all(mul % tp_size == 0 for mul, _ in hid_f), (hid_f, tp_size)
    hid_l = Irreps([(mul // tp_size, ir) for mul, ir in hid_f])
    use_gate = bool(getattr(model, "gate", False))
    if use_gate:
        s_f, g_f, gd_f = irreps2gate(hid_f)
        use_gate = gd_f.num_irreps > 0
    if use_gate:
        tp_out_f = s_f + g_f + gd_f
        s_l, _, gd_l = irreps2gate(hid_l)
        from ..irreps import Irrep

        g_l = Irreps([(mul, Irrep(0, 1)) for mul, _ in gd_l])
        tp_out_l = s_l + g_l + gd_l
        entry_map = {}
        for j in range(len(list(s_l))):
            entry_map[j] = (j, 0)
        # gates: local entries tile the (possibly merged) full gates entries
        nf_s, nl_s = len(list(s_f)), len(list(s_l))
        g_f_list, g_l_list = list(g_f), list(g_l)
        cum = 0          # cumulative FULL-channel offset into the gates
        f_j, f_off = 0, 0
        for j, (mul_l, _) in enumerate(g_l_list):
            w = mul_l * tp_size
            while cum >= f_off + g_f_list[f_j][0]:
                f_off += g_f_list[f_j][0]
                f_j += 1
            assert cum + w <= f_off + g_f_list[f_j][0]
            entry_map[nl_s + j] = (nf_s + f_j, cum - f_off)
            cum += w
        for j in range(len(list(gd_l))):
            entry_map[nl_s + len(g_l_list) + j] = (
                nf_s + len(g_f_list) + j, 0)
    else:
        tp_out_f = hid_f
        tp_out_l = hid_l
        entry_map = {j: (j, 0) for j in range(len(list(hid_l)))}
    in_f = Irreps(f"{model.emb_dim}x0e") if layer == 0 else hid_f
    in_l = (Irreps(f"{model.emb_dim // tp_size}x0e") if layer == 0
            else hid_l)
    full_tp = EdgeTensorProduct(in_f, sh_irreps, tp_out_f)
    local_tp = EdgeTensorProduct(in_l, sh_irreps,
                                 scale_mul(tp_out_l, tp_size))
    return full_tp, local_tp, entry_map


def _conv_head_cols(model, layer: int, tp_size: int, shard: int):
    """Per LOCAL fc_out head of conv ``layer``: (full_group_index, column
    index array into the FULL model's fc_out{full_group} kernel/bias last
    axis) for mul-shard ``shard``.  Derived purely from the two TP
    descriptors — no model-specific name knowledge beyond the conv stack
    convention, so MACE and TFN share this code path."""
    full_tp, local_tp, entry_map = _conv_tp_pair(model, layer, tp_size)
    group_of_entry = {g[0]: gi for gi, g in enumerate(full_tp._groups)}
    # per full group: (i_in1, i_in2) -> (flat base offset, w_full)
    path_base = {}
    for gi, (i_out, n_p, _, _, _, _, _) in enumerate(full_tp._groups):
        off = 0
        for p in full_tp.paths:
            if p.i_out != i_out:
                continue
            path_base[(gi, p.i_in1, p.i_in2)] = (off, p.mul_out)
            off += p.mul_in1 * p.mul_out
    out = []
    for (i_out_l, n_p, _, _, _, _, w_l) in local_tp._groups:
        gf, col_off = entry_map[i_out_l]
        gi = group_of_entry[gf]
        cols = []
        for p in local_tp.paths:
            if p.i_out != i_out_l:
                continue
            base, w_f = path_base[(gi, p.i_in1, p.i_in2)]
            u_loc = p.mul_in1
            rows = base + (shard * u_loc + np.arange(u_loc)) * w_f
            cols.append(
                (rows[:, None] + (col_off + np.arange(w_l))[None, :])
                .reshape(-1))
        out.append((gi, np.concatenate(cols)))
    return out


def shard_mace_variables(variables, model, tp_size: int):
    """Split a FULL model's variables into tp_size mul-shards, stacked on a
    leading axis (ready for shard_map in_spec P('tp')).  Despite the
    historical name this is the GENERIC rule-based sharder: rules match on
    the structural role of each parameter (embedding table, edge-MLP trunk,
    per-channel stats, irrep-mul weight rows, readout), and the fc_out head
    columns come from the TP descriptors (``_conv_head_cols``) — the same
    code path shards MACEModel and TFNModel (gate head regrouping
    included)."""
    head_cols = {}  # layer -> list of (full_group, cols) per shard

    def conv_heads(layer, p):
        if (layer, p) not in head_cols:
            head_cols[(layer, p)] = _conv_head_cols(model, layer, tp_size, p)
        return head_cols[(layer, p)]

    out_cols = {}
    for col, tree in variables.items():
        flat = traverse_util.flatten_dict(tree)
        shards = [dict() for _ in range(tp_size)]
        for path, x in flat.items():
            x = np.asarray(x)
            key = "/".join(path)
            if "/fc_out" in key:
                # handled below via the head map (local head count may
                # differ from the full model's when gates regroup)
                continue
            if col == "u_tables":
                parts = [x] * tp_size   # channel-free CG constants: replicate
            elif key.startswith("emb_in/"):
                parts = np.split(x, tp_size, axis=-1)
            elif "/fc/" in key:
                parts = [x] * tp_size                       # replicated
            elif "/_bn/" in key or "/SymmetricContraction" in key:
                parts = np.split(x, tp_size, axis=-1)       # per-channel
            elif "/IrrepsLinear" in key:
                parts = np.split(x, tp_size, axis=0)        # weight rows
            elif key in ("Dense_0/kernel", "pred/kernel"):
                parts = np.split(x, tp_size, axis=0)        # row-parallel in
            elif key.startswith(("Dense_", "pred/")):
                parts = [x] * tp_size                       # replicated
            else:
                raise ValueError(f"no TP sharding rule for {col}:{key}")
            for p in range(tp_size):
                shards[p][path] = parts[p]
        # fc_out heads: regroup via the TP-descriptor column map.  The
        # LOCAL head list can be longer than the full model's (gate case),
        # so local head g_l reads columns of FULL head ``gf``.
        conv_layers = sorted({
            int(path[0].split("_")[1]) for path in flat
            if len(path) >= 2 and path[1].startswith("fc_out")
        })
        for i in conv_layers:
            for p in range(tp_size):
                for g_l, (gf, cols) in enumerate(conv_heads(i, p)):
                    for leaf in ("kernel", "bias"):
                        src = flat.get((f"conv_{i}", f"fc_out{gf}", leaf))
                        if src is None:
                            continue
                        shards[p][(f"conv_{i}", f"fc_out{g_l}", leaf)] = (
                            np.asarray(src)[..., cols])
        stacked = {
            path: jnp.stack([shards[p][path] for p in range(tp_size)])
            for path in shards[0]
        }
        out_cols[col] = traverse_util.unflatten_dict(stacked)
    return out_cols


# alias: the rule-based sharder is model-agnostic (MACE, TFN, ...)
shard_model_variables = shard_mace_variables


def tp_apply(model, sharded_variables, mesh: Mesh, axis: str = "tp"):
    """Build a jit-compiled TP forward: (sharded_variables, batch) -> out.
    ``model`` is the FULL model; the per-shard module is derived."""
    local = tp_local_model(model, mesh.shape[axis], axis)

    def per_device(variables, batch):
        variables = jax.tree.map(lambda x: x[0], variables)
        return local.apply(variables, batch, train=False)

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def dp_tp_train_step(model, tx, mesh: Mesh, loss_fn,
                     dp_axis: str = "dp", tp_axis: str = "tp"):
    """Hybrid 2-D parallel train step over a (dp, tp) mesh: every dp row
    holds a full tp-sharded replica of the model; each dp row processes its
    own graph shard.

    Layout: ``variables``/``opt_state`` carry a leading tp-shard axis
    (``shard_mace_variables``) -> in_spec P(tp); the batch carries a leading
    dp-shard axis (``shard_batches``) -> in_spec P(dp).  Communication per
    step: the model's per-layer [N, hidden] psums ride the tp axis; ONE
    gradient psum rides the dp axis (each tp shard all-reduces only its own
    parameter slice — the dp gradient payload is 1/tp of the model).  This
    is the standard 2-D mesh recipe (scaling-book): tp inside the
    fast-ICI dimension, dp outside."""
    k = mesh.shape[tp_axis]
    local = tp_local_model(model, k, tp_axis)

    def per_device(variables, opt_state, batch, rng):
        variables = jax.tree.map(lambda x: x[0], variables)   # strip tp stack
        opt_state = jax.tree.map(lambda x: x[0], opt_state)
        batch = jax.tree.map(lambda x: x[0], batch)           # strip dp stack
        # fold ONLY the dp axis: dp replicas see different data and need
        # distinct dropout masks, but the k tp shards of one replica compute
        # the SAME activations redundantly — folding tp would desynchronize
        # their dropout masks and break the loss/k redundancy invariant below
        rng = collectives.fold_in_axes(rng, dp_axis)

        def loss_of(params):
            vs = {**variables, "params": params}
            pred, mutated = local.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            # /k: the k tp shards compute the loss redundantly and SPMD AD
            # sums their identical cotangents through the tp psums (see
            # tp_train_step)
            return loss_fn(pred, batch) / k, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        grads = jax.lax.psum(grads, axis_name=dp_axis)
        loss = jax.lax.psum(loss, axis_name=dp_axis)
        mutated = jax.tree.map(
            lambda x: jax.lax.pmean(x, axis_name=dp_axis), mutated)
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {**variables, "params": params, **mutated}
        stack = lambda t: jax.tree.map(lambda x: x[None], t)
        return stack(new_vars), stack(opt_state), loss * k

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(tp_axis), P(tp_axis), P(dp_axis), P()),
        out_specs=(P(tp_axis), P(tp_axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng


def tp_train_step(model, tx, mesh: Mesh, loss_fn, axis: str = "tp"):
    """TP train step: each shard owns its parameter slice; the loss (already
    replicated after the readout psum) differentiates into exact per-shard
    gradients — no gradient collective is needed (unlike DP)."""
    k = mesh.shape[axis]
    local = tp_local_model(model, k, axis)

    def per_device(variables, opt_state, batch, rng):
        variables = jax.tree.map(lambda x: x[0], variables)
        opt_state = jax.tree.map(lambda x: x[0], opt_state)
        # NOTE: rng is NOT folded over the tp axis — every shard must draw
        # the same dropout mask for the redundant-computation invariant
        # (loss/k below) to hold; only data-parallel axes get distinct keys

        def loss_of(params):
            vs = {**variables, "params": params}
            pred, mutated = local.apply(
                vs, batch, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            # the loss is computed redundantly on every shard; SPMD AD sums
            # the k identical cotangents through the psums, so differentiate
            # loss/k to get exact single-device gradients
            return loss_fn(pred, batch) / k, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        new_vars = {**variables, "params": params, **mutated}
        stack = lambda t: jax.tree.map(lambda x: x[None], t)
        return stack(new_vars), stack(opt_state), loss * k

    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def with_default_rng(variables, opt_state, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jitted(variables, opt_state, batch, rng)

    return with_default_rng
