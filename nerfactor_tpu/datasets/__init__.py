"""Dataset registry (reference parity: nerfactor/datasets/__init__.py:18)."""

import importlib


def get_dataset_class(dataset_name):
    mod = importlib.import_module('nerfactor_tpu.datasets.' + dataset_name)
    return mod.Dataset
