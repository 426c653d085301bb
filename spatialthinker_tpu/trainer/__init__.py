from .grpo_trainer import GRPOTrainer
from .train_step import TrainBatch, compute_log_probs, make_optimizer, make_update_fn

__all__ = ["GRPOTrainer", "TrainBatch", "compute_log_probs", "make_optimizer", "make_update_fn"]
