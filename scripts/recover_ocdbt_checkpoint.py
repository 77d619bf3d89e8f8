"""Recover an interrupted orbax OCDBT checkpoint from its per-process kvstore.

An orbax save that dies between writing ``ocdbt.process_0/`` and the final
top-level manifest merge leaves a ``*.orbax-checkpoint-tmp`` directory that
``PyTreeCheckpointer.restore`` refuses ("incomplete checkpoint") even though
every array is present and readable in the per-process kvstore. This tool
reads each array straight out of ``ocdbt.process_0/`` with tensorstore's
zarr-over-ocdbt driver and re-saves a fresh, complete checkpoint.

(The reference relies on Lightning's atomic ``ModelCheckpoint`` writes and has
no recovery path for torn saves — SURVEY §5.4; on preemptible/tunneled
runtimes torn saves are a real failure mode, cf. scripts/run_resumable.sh.)

Usage:
    python scripts/recover_ocdbt_checkpoint.py <tmp_ckpt_dir> <out_dir> \
        experiment=lj13 [overrides...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def recover(tmp_dir: str, out_dir: str, experiment: str, overrides=None, fill=None):
    """``fill`` maps leaf names lost in the torn save to explicit values
    (e.g. ``{"epoch": 999}`` when only the scalar epoch array is missing)."""
    from pita_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    import jax
    import numpy as np
    import tensorstore as ts

    from pita_tpu.configs import compose, build_trainer
    from pita_tpu.io import checkpoint as ckpt_mod

    cfg = compose(experiment, overrides=overrides or {})
    trainer = build_trainer(cfg)
    item = ckpt_mod._state_pytree(trainer)

    base = f"file://{os.path.abspath(tmp_dir)}/ocdbt.process_0/"
    kv = ts.KvStore.open({"driver": "ocdbt", "base": base}).result()
    available = {k.decode().rsplit("/", 1)[0] for k in kv.list().result()}

    def _read(name):
        return np.asarray(
            ts.open(
                {"driver": "zarr", "kvstore": {"driver": "ocdbt", "base": base, "path": name + "/"}},
                open=True,
            ).result()[...].read().result()
        )

    paths_leaves = jax.tree_util.tree_flatten_with_path(item)[0]

    def _name(path):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return ".".join(parts)

    names = [_name(p) for p, _ in paths_leaves]
    missing = [n for n in names if n not in available and n not in (fill or {})]
    extra = sorted(available - set(names))
    if missing:
        raise SystemExit(f"arrays missing from kvstore ({len(missing)}): {missing[:5]}…")
    if extra:
        print(f"note: {len(extra)} arrays in kvstore not in current state tree: {extra[:5]}…")

    leaves = [
        (np.asarray(fill[n], dtype=np.asarray(leaf).dtype) if n in (fill or {}) and n not in available else _read(n))
        for n, (_, leaf) in zip(names, paths_leaves)
    ]
    state = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(item), leaves)
    print(f"read {len(leaves)} arrays; epoch={int(state['epoch'])}")

    import orbax.checkpoint as ocp

    out = os.path.abspath(out_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(out, state, force=True)
    print(f"recovered checkpoint written to {out}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if len(args) < 3:
        raise SystemExit(__doc__)
    tmp_dir, out_dir = args[0], args[1]
    experiment = "gmm"
    overrides = {}
    fill = {}
    for a in args[2:]:
        k, v = a.split("=", 1)
        if k == "experiment":
            experiment = v
        elif k.startswith("fill."):
            fill[k[len("fill."):]] = float(v) if "." in v else int(v)
        else:
            overrides[k] = v
    recover(tmp_dir, out_dir, experiment, overrides, fill)
