"""Top-level InstanceRefer model: lang -> attribute -> relation -> scene.

Mirror of reference ``models/instancerefer.py`` minus its dynamic
``importlib`` dispatch (``:20-34``): submodules are selected statically by
config flags (any of attribute/relation/scene may be disabled, matching the
reference's optional-module behavior), and the mutable ``data_dict`` threading
becomes a functional dict-in/new-dict-out contract.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from instancerefer_tpu.models.attribute_module import AttributeModule
from instancerefer_tpu.models.lang_module import LangModule
from instancerefer_tpu.models.relation_module import RelationModule
from instancerefer_tpu.models.scene_module import SceneModule


class InstanceRefer(nn.Module):
    input_feature_dim: int
    num_classes: int = 18
    max_candidates: int = 16
    use_bidir: bool = True
    k: int = 8
    use_attribute: bool = True
    use_relation: bool = True
    use_scene: bool = True
    # None keeps each submodule's reference dropout rate (lang word 0.1,
    # relation/scene 0.15); a float overrides them all — used by parity tests
    # that need train-mode stochasticity removed (dropout 0)
    dropout_override: Optional[float] = None

    @nn.compact
    def __call__(self, data_dict: dict, *, train: bool, bn_momentum: float = 0.1) -> dict:
        do = self.dropout_override
        data_dict = LangModule(
            num_text_classes=self.num_classes,
            use_lang_classifier=True,
            use_bidir=self.use_bidir,
            emb_size=300,
            hidden_size=128,
            name="lang",
            **({} if do is None else {"word_dropout": do}),
        )(data_dict, train=train)

        if self.use_attribute:
            data_dict = AttributeModule(
                input_feature_dim=self.input_feature_dim,
                max_candidates=self.max_candidates,
                name="attribute",
            )(data_dict, train=train, bn_momentum=bn_momentum)

        if self.use_relation:
            data_dict = RelationModule(
                input_feature_dim=self.input_feature_dim,
                num_classes=self.num_classes,
                k=self.k,
                name="relation",
                **({} if do is None else {"dropout_rate": do}),
            )(data_dict, train=train, bn_momentum=bn_momentum)

        if self.use_scene:
            data_dict = SceneModule(
                input_feature_dim=self.input_feature_dim,
                name="scene",
                **({} if do is None else {"dropout_rate": do}),
            )(data_dict, train=train, bn_momentum=bn_momentum)

        return data_dict
