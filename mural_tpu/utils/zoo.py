"""Shipped-model zoo: import and convert the reference's published
checkpoints.

The reference ships ready-to-use trained checkpoints for 4 species
(`models/{Homo_sapiens,Macaca_mulatta,Arabidopsis_thaliana,
Drosophila_melanogaster}/{SNV,INDEL}/<submodel>/` -- recipes in
`models/Homo_sapiens/SNV/README:1-18` and `models/Homo_sapiens/INDEL/
README:1-16`), each a torch ``state_dict`` plus pickled config and
FullDirichlet calibrator (`MuRaL/training.py:570-578`).  Transfer
learning from these published models is a headline reference capability
(`docs/usage.rst`, transfer section); this module makes every shipped
artifact loadable and convertible to the native checkpoint format:

- :func:`load_zoo_checkpoint` -- build the Flax model from the
  checkpoint's own ``model.config.pkl`` (the authoritative architecture
  record, `run_train_TL_raytune.py:138-171`) and fill it from the torch
  ``state_dict`` (pure-python zip reader, no torch needed at runtime).
- :func:`convert_checkpoint` -- the documented ``convert`` CLI path:
  re-export a reference checkpoint as a native msgpack triple (plus the
  calibrator re-pickled onto our classes) that ``transfer`` / ``predict``
  load without the torch-import shim.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from mural_tpu.train.checkpoint import (load_calibrator, load_checkpoint,
                                        load_config, save_checkpoint)


def infer_model_type(config: Dict) -> str:
    """SNV checkpoints carry no ``down_list``; INDEL ones always do
    (`MuRaL/commands/train.py:404`)."""
    return "indel" if config.get("down_list") else "snv"


def input_geometry(config: Dict, model_type: str) -> Tuple[int, int]:
    """(n k-mer columns, distal window length) for a checkpoint config.

    SNV windows are ``2r+1`` bp anchored on a base; INDEL windows are
    ``2r`` bp anchored on a gap (`MuRaL/data/preprocessing.py:524-567`).
    The local branch sees ``2*local_radius + 2 - local_order`` k-mer
    columns (k-mers sliding over the ``2r+1``-long local window).
    """
    r = int(config["local_radius"])
    k = int(config.get("local_order", 3))
    n_cat = 2 * r + 2 - k
    w = 2 * int(config["distal_radius"]) + (1 if model_type == "snv"
                                            else 0)
    return n_cat, w


def load_zoo_checkpoint(ckpt_dir: str,
                        model_type: Optional[str] = None):
    """Load a shipped (or native) checkpoint directory.

    Returns ``(model, variables, config, model_type)`` where ``model``
    is the Flax module built from the checkpoint's config pickle and
    ``variables`` is ``{params, batch_stats}`` (torch state_dicts are
    transparently imported; native msgpack loads directly).
    """
    import jax
    import jax.numpy as jnp

    from mural_tpu.predict.pipeline import build_model_from_config

    config = load_config(os.path.join(ckpt_dir, "model.config.pkl"))
    if model_type is None:
        model_type = infer_model_type(config)
    model = build_model_from_config(config, n_cont=0,
                                    model_type=model_type)
    n_cat, w = input_geometry(config, model_type)
    cat0 = (jnp.zeros((2, n_cat), jnp.int32) if model_type == "snv"
            else None)
    distal0 = jnp.zeros((2, w, 4), jnp.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.key(0), cat0, None, distal0,
                           False))
    template = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype),
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {})})
    variables = load_checkpoint(os.path.join(ckpt_dir, "model"),
                                template)
    return model, variables, config, model_type


def convert_checkpoint(ckpt_dir: str, out_dir: str,
                       model_type: Optional[str] = None,
                       printer=print) -> Dict:
    """Convert a reference checkpoint directory to a native triple.

    Loads the torch ``state_dict`` + config + calibrator, runs a
    forward smoke check (finite outputs on a random batch), and writes
    ``model`` (msgpack), ``model.config.pkl`` and ``model.fdiri_cal.pkl``
    under ``out_dir``.  The result is drop-in for ``transfer`` /
    ``predict`` / ``predict_genome``.
    """
    import jax.numpy as jnp

    model, variables, config, model_type = load_zoo_checkpoint(
        ckpt_dir, model_type)
    n_cat, w = input_geometry(config, model_type)

    rng = np.random.default_rng(0)
    cat = (jnp.asarray(rng.integers(
        0, 4 ** int(config.get("local_order", 3)) + 1,
        (4, n_cat)).astype(np.int32)) if model_type == "snv" else None)
    distal = jnp.asarray(rng.normal(size=(4, w, 4)).astype(np.float32))
    out = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        cat, None, distal, False))
    if not np.all(np.isfinite(out)):
        raise ValueError(f"{ckpt_dir}: imported checkpoint produced "
                         "non-finite outputs")
    if out.shape != (4, int(config["n_class"])):
        raise ValueError(f"{ckpt_dir}: unexpected output shape "
                         f"{out.shape}")

    calibrator = None
    cal_path = os.path.join(ckpt_dir, "model.fdiri_cal.pkl")
    if os.path.exists(cal_path):
        calibrator = load_calibrator(cal_path)
        probs = np.asarray(
            calibrator.predict_proba(
                rng.dirichlet([1.0] * int(config["n_class"]), size=8)))
        if not (np.all(np.isfinite(probs))
                and np.allclose(probs.sum(axis=1), 1.0, atol=1e-6)):
            raise ValueError(f"{ckpt_dir}: calibrator sanity check "
                             "failed")

    os.makedirs(out_dir, exist_ok=True)
    save_checkpoint(os.path.join(out_dir, "model"),
                    variables["params"], variables["batch_stats"],
                    dict(config), calibrator=calibrator)
    printer(f"converted {ckpt_dir} -> {out_dir} "
            f"({model_type}, model_no {config.get('model_no')}, "
            f"distal_radius {config.get('distal_radius')}, "
            f"n_class {config.get('n_class')}"
            f"{', calibrator' if calibrator is not None else ''})")
    return config


def iter_reference_zoo(root: str):
    """Yield every shipped checkpoint directory under a reference
    ``models/`` tree as ``(species, family, submodel, path)``."""
    if not os.path.isdir(root):
        return
    for species in sorted(os.listdir(root)):
        sp_dir = os.path.join(root, species)
        if not os.path.isdir(sp_dir):
            continue
        for family in sorted(os.listdir(sp_dir)):
            fam_dir = os.path.join(sp_dir, family)
            if not os.path.isdir(fam_dir):
                continue
            for sub in sorted(os.listdir(fam_dir)):
                ck = os.path.join(fam_dir, sub)
                if os.path.exists(os.path.join(ck, "model")):
                    yield species, family, sub, ck
