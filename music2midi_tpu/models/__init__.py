from .t5 import (  # noqa: F401
    T5Config,
    cross_entropy_loss,
    decode_step,
    decoder_forward,
    encode,
    init_params,
    init_kv_cache,
    precompute_cross_kv,
    t5_config_from,
    t5_forward,
)
