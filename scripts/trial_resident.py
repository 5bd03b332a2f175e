"""Trial the whole-experiment resident monolith for a heavyweight model on
the TPU, vs the stepwise engine at the same config.

Usage: python scripts/trial_resident.py [tfn|mace] [n_epochs]

Context: TFN/MACE were routed through the stepwise engine because their
per-path HLO made monolith compiles take tens of minutes (and once faulted
the tunnel's compile helper). After the combined-CG/fused-contraction
rewrite their monolith programs are SMALLER than EGNN's (which has always
compiled fine), so the ban should be obsolete — this script measures it
safely: one model, one program, wrapped in timeout by the caller.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geometric_message_passing_tpu import datasets as ds
from geometric_message_passing_tpu.experiments.train import (
    fit_resident, fit_stepwise, init_variables, seed_everything,
    tiny_init_batch)
from geometric_message_passing_tpu.graph import (GraphLoader, pad_sizes,
                                                 random_split)
from geometric_message_passing_tpu.models import (DimeNetPPModel,
                                                  GVPGNNModel, MACEModel,
                                                  SphereNetModel, TFNModel)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "tfn"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    data = ds.create_star_graphs(num=1500, fold=[7], dim=3, target="max",
                                 seed=0)
    tr, va, te = random_split(data, [0.5, 0.2, 0.3], seed=0)
    pad = pad_sizes(data, 100)
    needs_tri = name in ("dimenet", "spherenet")
    needs_quads = name == "spherenet"
    tri_pad = None
    if needs_tri:
        from geometric_message_passing_tpu.triplets import triplet_pad_sizes
        tri_pad = triplet_pad_sizes(data, 100, needs_quads)
    kw = dict(batch_size=100, pad=pad, with_triplets=needs_tri,
              with_quads=needs_quads, triplet_pad=tri_pad)
    tr_l = GraphLoader(tr, shuffle=True, seed=0, **kw)
    va_l, te_l = GraphLoader(va, **kw), GraphLoader(te, **kw)
    model = dict(
        tfn=TFNModel(out_dim=1, emb_dim=64, num_layers=4, max_ell=3,
                     pool="first"),
        mace=MACEModel(out_dim=1, emb_dim=64, num_layers=2, max_ell=3,
                       correlation=3, pool="first"),
        dimenet=DimeNetPPModel(out_dim=1, num_layers=4),
        spherenet=SphereNetModel(out_dim=1, num_layers=2),
        gvp=GVPGNNModel(out_dim=1, num_layers=4, pool="first"),
    )[name]
    variables = init_variables(model, seed_everything(0),
                               tiny_init_batch(tr_l))
    args = dict(n_epochs=n_epochs, lr=5e-4, task="regression", cosine=True,
                seed=0)

    from geometric_message_passing_tpu.experiments.train import RESIDENT_CHUNK
    chunk = RESIDENT_CHUNK.get(model.__class__.__name__)
    t0 = time.time()
    r_res = fit_resident(model, variables, tr_l, va_l, te_l,
                         epoch_chunk=chunk, **args)
    t_res = time.time() - t0
    print(f"resident: wall {t_res:.1f}s train {r_res.train_time:.1f}s "
          f"val {r_res.best_val:.4f} test {r_res.test:.4f}", flush=True)

    t0 = time.time()
    r_st = fit_stepwise(model, variables, tr_l, va_l, te_l, **args)
    t_st = time.time() - t0
    print(f"stepwise: wall {t_st:.1f}s train {r_st.train_time:.1f}s "
          f"val {r_st.best_val:.4f} test {r_st.test:.4f}", flush=True)
    print(f"agreement: dval={abs(r_res.best_val - r_st.best_val):.2e} "
          f"dtest={abs(r_res.test - r_st.test):.2e}")


if __name__ == "__main__":
    main()
