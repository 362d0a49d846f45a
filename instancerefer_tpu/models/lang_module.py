"""Language encoder: GloVe word projection + masked bi-GRU + 4 attention heads.

Mirror of reference ``models/lang_module.py`` (instantiated with
``emb_size=300, hidden=128`` at ``models/instancerefer.py:21``):

* word_projection: Linear(300->256) ReLU Dropout(0.1) Linear(256->256) ReLU,
* 2-layer bidirectional GRU (hidden 128 -> 256-d step outputs) with pack/pad
  semantics via ``ops/gru.MaskedGRU``,
* four independent scalar attentions over the GRU outputs pooling the
  *projected word embeddings* (not the GRU states — a reference quirk at
  ``models/lang_module.py:65``) into ``lang_attr/cls/rel/scene_feats``,
* 18-way text classifier on the cls head.

The reference's softmax->mask->renormalize (``:62-64``) is algebraically a
masked softmax (the full-softmax normalizer cancels in the renormalization),
so a single masked softmax over the fixed T=126 grid is exact.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from instancerefer_tpu.models.basic_blocks import TorchLinear
from instancerefer_tpu.ops.gru import MaskedGRU, length_mask


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(mask, logits, neg)
    return jnp.where(mask, nn.softmax(logits, axis=axis), 0.0)


class LangModule(nn.Module):
    num_text_classes: int
    use_lang_classifier: bool = True
    use_bidir: bool = True
    emb_size: int = 300
    hidden_size: int = 128
    word_dropout: float = 0.1

    @nn.compact
    def __call__(self, data_dict: dict, *, train: bool) -> dict:
        feats = data_dict["lang_feat"]  # [B, T, 300]
        lengths = data_dict["lang_len"]  # [B]
        b, t, _ = feats.shape

        h_dim = 256
        embed = TorchLinear(h_dim, name="word_projection_0")(feats)
        embed = nn.relu(embed)
        embed = nn.Dropout(self.word_dropout, deterministic=not train)(embed)
        embed = TorchLinear(h_dim, name="word_projection_1")(embed)
        embed = nn.relu(embed)

        gru_out = MaskedGRU(
            hidden_size=self.hidden_size,
            num_layers=2,
            bidirectional=self.use_bidir,
            name="gru",
        )(embed, lengths)  # [B, T, 128*(1+bidir)] zeros past lengths

        mask = length_mask(lengths, t)  # [B, T]

        out = dict(data_dict)
        # The reference overwrites data_dict['lang_feat'] with the GRU outputs
        # (models/lang_module.py:58); preserved for data_dict key parity.
        out["lang_feat"] = gru_out

        def head(name):
            logits = TorchLinear(1, name=name)(gru_out).squeeze(-1)  # [B, T]
            atten = masked_softmax(logits, mask, axis=1)
            pooled = jnp.einsum(
                "bt,btc->bc", atten, embed, preferred_element_type=jnp.float32
            )
            return atten, pooled

        atten_a, embed_a = head("fc_a")
        atten_cls, embed_cls = head("fc_cls")
        atten_rel, embed_rel = head("fc_rel")
        atten_scene, embed_scene = head("fc_scene")

        out["atten_attr"] = atten_a
        out["atten_rel"] = atten_rel
        out["atten_scene"] = atten_scene
        out["lang_cls_feats"] = embed_cls
        out["lang_attr_feats"] = embed_a
        out["lang_rel_feats"] = embed_rel
        out["lang_scene_feats"] = embed_scene

        if self.use_lang_classifier:
            out["lang_scores"] = TorchLinear(self.num_text_classes, name="lang_cls")(
                embed_cls
            )
        return out
