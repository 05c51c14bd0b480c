from audio_style_transfer_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    Trainer,
    learning_rate,
)
