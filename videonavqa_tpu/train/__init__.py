from videonavqa_tpu.train.loss import cross_entropy_loss  # noqa: F401
from videonavqa_tpu.train.metrics import f1_score, per_class_accuracies  # noqa: F401
from videonavqa_tpu.train.step import make_eval_step, make_train_step, make_optimizer  # noqa: F401
