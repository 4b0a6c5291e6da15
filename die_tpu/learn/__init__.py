from die_tpu.learn.es import EsState, OpenAIES, PGPE, SepCMAES
from die_tpu.learn.train import TrainConfig, train

__all__ = ["EsState", "OpenAIES", "PGPE", "SepCMAES", "TrainConfig", "train"]
