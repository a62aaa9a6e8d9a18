"""Model registry and config-driven construction.

Parity with ``model_choice`` (MuRaL/model/nn_utils.py:186-230): the
runtime config dict (the same dict that is pickled next to every
checkpoint) fully determines the architecture.
"""

from __future__ import annotations

from typing import Dict

from mural_tpu.models.indel import UNetSmall
from mural_tpu.models.snv import SNVNet0, SNVNet1, SNVNet2, SNVNet3

MODEL_REGISTRY = {
    "snv": {0: SNVNet0, 1: SNVNet1, 2: SNVNet2, 3: SNVNet3},
    "indel": {0: UNetSmall},
}


def build_model(model_no: int, config: Dict, common: Dict, model_type: str):
    """Construct a Flax module from a MuRaL-style config dict.

    ``common`` carries {'emb_dims', 'n_cont', 'n_class', 'distal_order',
    'in_channels'} exactly as training.py:264-270 builds it.
    """
    if model_type not in MODEL_REGISTRY:
        raise ValueError(f"model_type must be one of "
                         f"{list(MODEL_REGISTRY)}, got {model_type}")
    model_map = MODEL_REGISTRY[model_type]
    if model_no not in model_map:
        raise ValueError(f"model_no for {model_type} must be one of "
                         f"{list(model_map)}, got {model_no}")
    cls = model_map[model_no]

    if model_type == "snv":
        emb_dims = common["emb_dims"]
        kwargs = dict(
            emb_vocab=4 ** config["local_order"] + 1,
            n_cat=len(emb_dims),
            lin_layer_sizes=[config["local_hidden1_size"],
                             config["local_hidden2_size"]],
            emb_dropout=config["emb_dropout"],
            lin_layer_dropouts=[config["local_dropout"],
                                config["local_dropout"]],
            n_class=common["n_class"],
            n_cont=common["n_cont"],
        )
        if model_no in (1, 2, 3):
            conv = dict(
                in_channels=common["in_channels"],
                out_channels=config["CNN_out_channels"],
                kernel_size=config["CNN_kernel_size"],
                distal_fc_dropout=config["distal_fc_dropout"],
            )
            if model_no == 1:
                kwargs = dict(n_class=common["n_class"], **conv)
            else:
                kwargs.update(conv)
        return cls(**kwargs)

    # indel
    return cls(
        n_class=common["n_class"],
        out_channels=config["CNN_out_channels"],
        kernel_size=config["CNN_kernel_size"],
        downsize=tuple(config["down_list"]),
        use_reverse=bool(config.get("use_reverse", False)),
    )


# Back-compat alias mirroring the reference name.
model_choice = build_model
