"""Dataset/asset path registry (reference ``spec/config.py:25-59``).

Everything is rooted at ``SPEC_DATA_ROOT`` (env-overridable, default
``./data`` like the reference) so the on-disk layout of the reference's
``prepare_data.sh`` bundle works unchanged.
"""

from __future__ import annotations

import os
from os.path import join


def data_root() -> str:
    return os.environ.get('SPEC_DATA_ROOT', 'data')


def smpl_model_dir() -> str:
    return join(data_root(), 'body_models', 'smpl')


def smpl_mean_params_path() -> str:
    return join(data_root(), 'smpl_mean_params.npz')


def j_regressor_h36m_path() -> str:
    return join(data_root(), 'J_regressor_h36m.npy')


def j_regressor_extra_path() -> str:
    return join(data_root(), 'J_regressor_extra.npy')


def camcalib_checkpoint_path() -> str:
    return join(data_root(), 'camcalib', 'checkpoints',
                'camcalib_sa_biased_l2.ckpt')


def spec_checkpoint_path() -> str:
    return join(data_root(), 'spec', 'checkpoints', 'spec_checkpoint.ckpt')


def dataset_folders() -> dict:
    d = data_root()
    return {
        'spec-mtp': join(d, 'dataset_folders', 'spec-mtp'),
        'spec-syn': join(d, 'dataset_folders', 'spec-syn'),
        '3dpw-test-cam': join(d, 'dataset_folders', '3dpw'),
        '3dpw': join(d, 'dataset_folders', '3dpw'),
        'pano360': join(d, 'dataset_folders', 'pano360'),
    }


def dataset_files() -> dict:
    d = join(data_root(), 'dataset_extras')
    return {
        'spec-mtp': join(d, 'spec-mtp_camcalib.npz'),
        'spec-syn': join(d, 'spec-syn_camcalib.npz'),
        '3dpw-test-cam': join(d, '3dpw_test_cam_camcalib.npz'),
    }


EVAL_MESH_DATASETS = ['3dpw', '3dpw-all', '3dpw-test-cam', 'spec-syn',
                      'spec-mtp']


def enable_compilation_cache(cache_dir: str = None) -> str:
    """Persistent XLA compilation cache for every CLI entry point.

    Remote TPU compiles (e.g. through a remote-compile tunnel) can take
    10-30 minutes for the fused two-stage graph; the persistent cache
    makes every rerun load in seconds. Resolution order: explicit arg,
    ``$SPEC_JAX_CACHE_DIR``, ``~/.cache/spec_tpu/jax``. Returns the
    directory used (best-effort — failures never block the run).
    """
    import jax

    configured = jax.config.jax_compilation_cache_dir
    if cache_dir is None and configured:
        return configured  # respect an explicitly configured cache
    d = cache_dir or os.environ.get('SPEC_JAX_CACHE_DIR') or os.path.join(
        os.path.expanduser('~'), '.cache', 'spec_tpu', 'jax')
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', d)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception as e:  # pragma: no cover
        print(f'[paths] compilation cache disabled: {e}')
    return d
