"""Model registry: name -> aligner module implementing the functional API
(init / em_step or train / align / loglik).  The CLI dispatches through this;
new aligners register here (SURVEY.md §2 C5–C9)."""

from __future__ import annotations

from types import ModuleType


def get_model(name: str) -> ModuleType:
    if name == "model1":
        from multimodalworddiscovery_tpu.models import model1

        return model1
    if name == "hmm":
        from multimodalworddiscovery_tpu.models import hmm

        return hmm
    if name == "hmm_gaussian":
        from multimodalworddiscovery_tpu.models import hmm_gaussian

        return hmm_gaussian
    if name == "attention":
        from multimodalworddiscovery_tpu.models import attention

        return attention
    if name == "hmm_dnn":
        from multimodalworddiscovery_tpu.models import hmm_dnn

        return hmm_dnn
    if name == "hmm_crf":
        from multimodalworddiscovery_tpu.models import hmm_crf

        return hmm_crf
    if name == "grounding":
        from multimodalworddiscovery_tpu.models import grounding

        return grounding
    if name == "segmental_kmeans":
        from multimodalworddiscovery_tpu.models import segmental_kmeans

        return segmental_kmeans
    raise KeyError(
        f"unknown model {name!r}; available: model1, hmm, hmm_gaussian, "
        "hmm_dnn, hmm_crf, attention, grounding, segmental_kmeans"
    )
