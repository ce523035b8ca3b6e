from rl_agents_tpu.trainer.evaluation import Evaluation

__all__ = ["Evaluation"]
