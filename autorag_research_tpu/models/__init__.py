from autorag_research_tpu.models.encoder import (
    EncoderConfig,
    RetrievalEncoder,
    contrastive_train_step,
)

__all__ = ["EncoderConfig", "RetrievalEncoder", "contrastive_train_step"]
