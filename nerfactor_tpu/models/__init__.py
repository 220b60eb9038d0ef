"""Model registry (reference parity: nerfactor/models/__init__.py:18)."""

import importlib


def get_model_class(model_name):
    mod = importlib.import_module('nerfactor_tpu.models.' + model_name)
    return mod.Model
