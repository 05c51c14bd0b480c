from audio_style_transfer_tpu.ckpt.convert import (
    convert_tf1_checkpoint,
    load_params,
    load_pretrained,
    save_params,
)
