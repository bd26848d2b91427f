#!/usr/bin/env python
"""Convert checkpoints both ways between the reference .pth layout
(torch/test_scene.py:61-62 load contract) and sgnn_tpu .ckpt.

Examples:
    python tools/convert_checkpoint.py --input sgnn.pth --output sgnn.ckpt
    python tools/convert_checkpoint.py --input model-epoch-31.ckpt \
        --output sgnn_export.pth      # export OUR trained model for the
                                      # reference code (needs torch)
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
    if args.input.endswith(".ckpt") and args.output.endswith(".pth"):
        # export direction: .ckpt -> reference state_dict (.pth)
        import torch

        from sgnn_tpu.models.sgnn import genmodel_init
        from sgnn_tpu.train.checkpoint import load_checkpoint
        from sgnn_tpu.utils.ckpt_convert import export_state_dict

        params, stats = genmodel_init(jax.random.PRNGKey(0), cfg)
        state, meta = load_checkpoint(
            args.input, create_train_state(params, stats)
        )
        sd = export_state_dict(state.params, state.stats, cfg)
        torch.save(
            {
                "epoch": meta.get("epoch", 0),
                "state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()},
                "optimizer": {},
            },
            args.output,
        )
        print(f"exported {args.input} -> {args.output} "
              f"({len(sd)} state_dict keys)")
        return
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
