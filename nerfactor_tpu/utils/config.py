"""INI config system with CLI parity to the reference.

Same contracts as nerfactor/util/config.py + trainvali.py:54-76:
  * configs are .ini files with only a DEFAULT section;
  * ``--config_override='k1=v1,k2=v2'`` merges on top;
  * the experiment name ``xname`` is a template over config values;
  * the resolved config is dumped next to the output dir as <outdir>.ini;
  * a checkpoint path implies its config at '<two dirs up>.ini'.
"""

import os
from configparser import ConfigParser


def read_config(path):
    config = ConfigParser()
    with open(path, 'r') as h:
        config.read_file(h)
    return config


def write_config(config, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as h:
        config.write(h)


def apply_override(config, override_str):
    """Merges 'k1=v1,k2=v2' into the DEFAULT section."""
    if not override_str:
        return config
    for kv in override_str.split(','):
        k, v = kv.split('=')
        config.set('DEFAULT', k, v)
    return config


def config2dict(config):
    out = {}
    for k, v in config.items('DEFAULT'):
        assert k not in out, "Duplicate flags not allowed"
        out[k] = v
    return out


def get_config_ini(ckpt_path):
    """Derives the experiment .ini from a checkpoint path by convention:
    <outroot>/<xname>/checkpoints/ckpt-N -> <outroot>/<xname>.ini."""
    return '/'.join(ckpt_path.split('/')[:-2]) + '.ini'


def get_xname(config):
    config_dict = config2dict(config)
    return config.get('DEFAULT', 'xname').format(**config_dict)


def resolve_config_path(name_or_path):
    """A bare name like 'nerf.ini' resolves into the shipped config dir."""
    if os.path.exists(name_or_path):
        return name_or_path
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(here), 'config', name_or_path)


class Config:
    """Typed view over a ConfigParser DEFAULT section, so models read
    ``cfg.getint('mlp_width')`` without repeating the section name."""

    def __init__(self, parser):
        self.parser = parser

    def get(self, key, fallback=None):
        return self.parser.get('DEFAULT', key, fallback=fallback)

    def getint(self, key, fallback=None):
        return self.parser.getint('DEFAULT', key, fallback=fallback)

    def getfloat(self, key, fallback=None):
        return self.parser.getfloat('DEFAULT', key, fallback=fallback)

    def getboolean(self, key, fallback=None):
        return self.parser.getboolean('DEFAULT', key, fallback=fallback)

    def has(self, key):
        return self.parser.has_option('DEFAULT', key)
