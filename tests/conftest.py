"""Test config: run everything on a virtual 8-device CPU mesh so sharding
code paths are exercised without TPU hardware."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# The axon TPU plugin (sitecustomize) pins jax_platforms=axon via
# jax.config, which beats the env var -- force it back to CPU before any
# backend is initialized.
import jax  # noqa: E402

import pytest  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def pytest_addoption(parser):
    parser.addoption(
        '--slow', action='store_true', default=False,
        help='also run tests marked slow (multi-process cluster tests '
             'that spawn full CPU training runs; ~15 extra minutes)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: multi-process / long-running tests '
                   '(excluded by default; enable with --slow)')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--slow'):
        return
    skip = pytest.mark.skip(reason='slow: run with --slow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
