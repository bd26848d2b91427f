#!/usr/bin/env python
"""Convert a reference sgnn.pth checkpoint to an sgnn_tpu .ckpt.

Example:
    python tools/convert_checkpoint.py --input sgnn.pth --output sgnn.ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="reference .pth")
    p.add_argument("--output", required=True, help="sgnn_tpu .ckpt path")
    p.add_argument("--encoder_dim", type=int, default=8)
    p.add_argument("--coarse_feat_dim", type=int, default=16)
    p.add_argument("--refine_feat_dim", type=int, default=16)
    p.add_argument("--num_hierarchy_levels", type=int, default=4)
    p.add_argument("--no_pass_occ", action="store_true")
    p.add_argument("--no_pass_feats", action="store_true")
    p.add_argument("--use_skip_sparse", type=int, default=1)
    p.add_argument("--use_skip_dense", type=int, default=1)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgnn_tpu.config import SGNNConfig
    from sgnn_tpu.train.checkpoint import save_checkpoint
    from sgnn_tpu.train.state import create_train_state
    from sgnn_tpu.utils.ckpt_convert import load_reference_checkpoint

    f = 2 ** (args.num_hierarchy_levels - 1) * 4
    cfg = SGNNConfig(
        encoder_dim=args.encoder_dim,
        input_dim=(f,) * 3,
        nf_coarse=args.coarse_feat_dim,
        nf=args.refine_feat_dim,
        num_hierarchy_levels=args.num_hierarchy_levels,
        pass_occ=not args.no_pass_occ,
        pass_feats=not args.no_pass_feats,
        use_skip_sparse=bool(args.use_skip_sparse),
        use_skip_dense=bool(args.use_skip_dense),
        batch_size=1,
    )
    params, stats, meta = load_reference_checkpoint(args.input, cfg)
    state = create_train_state(params, stats)
    save_checkpoint(
        args.output, state, epoch=meta.get("epoch", 0), iteration=0,
        extra={"source": os.path.basename(args.input)},
    )
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {args.input} -> {args.output} ({n} params, "
          f"epoch {meta.get('epoch', 0)})")


if __name__ == "__main__":
    main()
