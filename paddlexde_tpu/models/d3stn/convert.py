"""Checkpoint conversion: reference D3STN weights -> this framework.

Counterpart of the reference's ``example/D3STN/convert2paddle.py`` (a
PyTorch->Paddle converter with a key-mapping dict + golden-output check,
``convert2paddle.py:13-128`` in DrownFish19/PaddleXDE). Here the direction is
reference-Paddle -> flax: given the reference's saved ``state_dict`` exported
to a plain ``{name: np.ndarray}`` dict (e.g. via
``np.savez(path, **{k: v.numpy() for k, v in paddle.load(f).items()})`` on a
machine that has paddle), produce the flax params pytree for
:class:`~paddlexde_tpu.models.d3stn.model.D3STN`.

Weight-layout notes:
- paddle ``nn.Linear`` kernels are [in, out] — same as flax Dense: no transpose.
- paddle NHWC ``Conv2D`` kernels are [out, in, kh, kw]; flax Conv expects
  [kh, kw, in, out]: transpose (2, 3, 1, 0).
- paddle ``nn.Embedding`` / LayerNorm map 1:1.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .config import D3STNConfig

__all__ = ["convert_reference_state_dict", "REFERENCE_KEY_RULES"]

# (reference-name fragment -> (flax path template, transform))
_CONV_T = lambda w: np.transpose(w, (2, 3, 1, 0))
_ID = lambda w: w

REFERENCE_KEY_RULES = [
    ("encoder_dense.weight", "encoder_dense/kernel", _ID),
    ("encoder_dense.bias", "encoder_dense/bias", _ID),
    ("decoder_dense.weight", "decoder_dense/kernel", _ID),
    ("decoder_dense.bias", "decoder_dense/bias", _ID),
    ("temporal_section_week.embedding.weight", "temporal_section_week/Embed_0/embedding", _ID),
    ("temporal_section_day.embedding.weight", "temporal_section_day/Embed_0/embedding", _ID),
    ("generator.weight", "generator/kernel", _ID),
    ("generator.bias", "generator/bias", _ID),
]

_ATTN_SUB = {
    "query_conv": "query_conv/Conv_0",
    "key_conv": "key_conv/Conv_0",
    "value_conv": "value_conv/Conv_0",
    "out_conv": "out_conv/Conv_0",
}


def _set(tree: Dict, path: str, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_reference_state_dict(state: Dict[str, np.ndarray], cfg: D3STNConfig):
    """Convert a reference state_dict (numpy-exported) to a flax params dict.

    Returns (params, unmatched_keys). Layers covered: dense projections,
    section embeddings, attention convs, GCN linears + alpha/beta gates,
    layer norms, generator. Unmatched reference keys are returned for
    inspection rather than silently dropped.
    """
    params: Dict = {}
    unmatched = []

    def enc_dec(layer_prefix, idx, our_prefix):
        rules = []
        for sub in ("self_attn", "src_attn"):
            for ref_c, our_c in _ATTN_SUB.items():
                rules.append(
                    (f"{layer_prefix}.layers.{idx}.{sub}.{ref_c}.weight",
                     f"{our_prefix}_{idx}/{sub}/{our_c}/kernel", _CONV_T)
                )
                rules.append(
                    (f"{layer_prefix}.layers.{idx}.{sub}.{ref_c}.bias",
                     f"{our_prefix}_{idx}/{sub}/{our_c}/bias", _ID)
                )
        rules.append(
            (f"{layer_prefix}.layers.{idx}.feed_forward_gcn.linear.weight",
             f"{our_prefix}_{idx}/gcn/Dense_0/kernel", _ID)
        )
        for g in ("alpha", "beta"):
            rules.append(
                (f"{layer_prefix}.layers.{idx}.feed_forward_gcn.{g}",
                 f"{our_prefix}_{idx}/gcn/{g}", _ID)
            )
        for s in range(3):
            rules.append(
                (f"{layer_prefix}.layers.{idx}.sublayer.{s}.norm.weight",
                 f"{our_prefix}_{idx}/sub{s}/LayerNorm_0/scale", _ID)
            )
            rules.append(
                (f"{layer_prefix}.layers.{idx}.sublayer.{s}.norm.bias",
                 f"{our_prefix}_{idx}/sub{s}/LayerNorm_0/bias", _ID)
            )
        return rules

    rules = list(REFERENCE_KEY_RULES)
    for i in range(cfg.encoder_num_layers):
        rules += enc_dec("encoder", i, "enc")
    for i in range(cfg.decoder_num_layers):
        rules += enc_dec("decoder", i, "dec")
    rules += [
        ("encoder.norm.weight", "encoder_norm/scale", _ID),
        ("encoder.norm.bias", "encoder_norm/bias", _ID),
        ("decoder.norm.weight", "decoder_norm/scale", _ID),
        ("decoder.norm.bias", "decoder_norm/bias", _ID),
        ("adaptive_embedding_encoder.embedding", "adaptive_embedding_encoder/embedding", _ID),
    ]
    rule_map = {ref: (ours, fn) for ref, ours, fn in rules}

    for key, value in state.items():
        if key in rule_map:
            ours, fn = rule_map[key]
            _set(params, ours, np.asarray(fn(np.asarray(value))))
        else:
            unmatched.append(key)
    return params, unmatched
