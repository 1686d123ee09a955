from followyourclick_tpu.training.train_step import (  # noqa: F401
    TrainConfig,
    create_train_state,
    train_step,
    trainable_mask,
)
