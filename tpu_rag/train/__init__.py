from tpu_rag.train.contrastive import ContrastiveTrainer, info_nce_loss, make_param_shardings

__all__ = ["ContrastiveTrainer", "info_nce_loss", "make_param_shardings"]
