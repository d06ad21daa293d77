from particle_fm_tpu.config.core import compose, instantiate, save_config, load_config

__all__ = ["compose", "instantiate", "save_config", "load_config"]
