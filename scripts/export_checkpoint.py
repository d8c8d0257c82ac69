"""Export a training checkpoint as a release (inference) checkpoint.

Strips the optimizer state (2/3 of a TrainState's bytes under AdamW) and
keeps {params, batch_stats, step} - everything inference and fine-tuning
resume-from-weights need. This is what gets committed under the repo as the
synthetic-scene learning-capability artifact (VERDICT r4 item 1: "the
checkpoint stored under the repo").

The exported layout restores with utils/checkpoint_io.restore against a
{"params": ..., "batch_stats": ..., "step": ...} template (see
scripts/eval_trained_regime.py for the load pattern against a TrainState;
release checkpoints use the dict template below).

Usage:
  python scripts/export_checkpoint.py output/synth_r4/checkpoint_0005000 \
      checkpoints/msmformer_synthetic_r4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # no TPU needed to restripe
    import jax

    from unseenobjectswithmeanshift_tpu.config import get_config
    from unseenobjectswithmeanshift_tpu.train.trainer import Trainer
    from unseenobjectswithmeanshift_tpu.utils import checkpoint_io

    import jax.numpy as jnp

    tr = Trainer(get_config("tabletop_pretrained"), dtype=jnp.bfloat16)
    st = tr.init_state(jax.random.PRNGKey(0), (32, 32), batch_size=1)
    st = checkpoint_io.restore(os.path.abspath(args.src), jax.device_get(st))
    release = {"params": jax.device_get(st.params),
               "batch_stats": jax.device_get(st.batch_stats),
               "step": jax.device_get(st.step)}
    checkpoint_io.save(os.path.abspath(args.dst), release)
    n = sum(x.size for x in jax.tree_util.tree_leaves(release["params"]))
    print(f"exported {args.src} -> {args.dst} ({n / 1e6:.1f}M params, "
          f"step {int(release['step'])})")


def load_release(path, trainer_state_template):
    """Restore a release checkpoint into a TrainState template (params/
    batch_stats/step only; opt_state keeps the template's init)."""
    import jax

    from unseenobjectswithmeanshift_tpu.utils import checkpoint_io

    t = trainer_state_template
    rel = checkpoint_io.restore(path, {
        "params": jax.device_get(t.params),
        "batch_stats": jax.device_get(t.batch_stats),
        "step": jax.device_get(t.step)})
    return t.replace(params=rel["params"], batch_stats=rel["batch_stats"],
                     step=rel["step"])


if __name__ == "__main__":
    main()
