"""Checkpoint IO: torch-dialect converters + orbax-native save/load.

The reference handles three torch checkpoint dialects (SURVEY.md §5.4):
lightning ``.ckpt`` (``state_dict`` with ``model.`` prefixes), PARE/
backbone-format plain state_dicts, and legacy SPIN ``model_checkpoint.pt``
(weights under ``['model']``). :func:`load_torch_state_dict` normalizes all
three to a flat name->ndarray dict; the model-specific converters map that
into flax variables. Native checkpoints use orbax (TrainState pytrees).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _on_device(variables: dict) -> dict:
    """Converted variable trees must leave the loaders as DEVICE arrays:
    a numpy pytree handed straight to a jitted forward re-uploads the
    full model on EVERY call (invisible on CPU, ~100 MB/call on a real
    host->device link). jnp.asarray is a no-op for leaves the
    converters already created on device."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, variables)


def load_torch_state_dict(path: str) -> dict:
    """Load any of the three torch dialects -> flat {name: np.ndarray},
    with lightning ``model.`` prefixes stripped."""
    import torch

    blob = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(blob, dict) and 'state_dict' in blob:
        sd = blob['state_dict']          # lightning
    elif isinstance(blob, dict) and 'model' in blob and not any(
            hasattr(v, 'numpy') for v in list(blob.values())[:3]
            if not isinstance(v, dict)):
        sd = blob['model']               # legacy SPIN
    else:
        sd = blob                        # plain state_dict
    out = {}
    for k, v in sd.items():
        if k.startswith('model.'):
            k = k[len('model.'):]
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            out[k] = np.asarray(v)
    return out


def merge_with_template(variables: dict, template: dict,
                        verbose: bool = True) -> dict:
    """Overlay converted ``variables`` onto a freshly-initialized
    ``template`` pytree, keeping the template leaf wherever the shapes
    disagree or the converted tree has no counterpart.

    This is the reference's ``load_pretrained_model(...,
    overwrite_shape_mismatch=True)`` behavior (SURVEY.md §5.4 /
    ``spec/models/hmr.py`` and tester ckpt loads): checkpoints with
    changed head widths still load, with mismatched leaves re-initialized.
    """
    import jax

    flat_t = jax.tree.leaves_with_path(template)
    flat_v = dict(jax.tree.leaves_with_path(variables))
    out = []
    for path, leaf in flat_t:
        cand = flat_v.get(path)
        if cand is not None and tuple(cand.shape) == tuple(leaf.shape):
            out.append(cand)
        else:
            if verbose and cand is not None:
                print(f'[checkpoints] shape mismatch at '
                      f'{jax.tree_util.keystr(path)}: checkpoint '
                      f'{tuple(cand.shape)} vs model {tuple(leaf.shape)} '
                      f'— keeping model init')
            elif verbose and cand is None:
                print(f'[checkpoints] missing in checkpoint: '
                      f'{jax.tree_util.keystr(path)} — keeping model init')
            out.append(leaf)
    return jax.tree.unflatten(jax.tree.structure(template), out)


def load_camcalib_variables(
    path: str, backbone: str = 'resnet50', num_fc_layers: int = 1,
    template: Optional[dict] = None,
) -> dict:
    """Released CamCalib ckpt -> flax variables (reference ckpt:
    ``camcalib_sa_biased_l2.ckpt``, resnet50 + 1 fc layer,
    scripts/camcalib_demo.py:39,74-81). Pass ``template`` (model.init
    variables) to tolerate shape mismatches like the reference's
    ``overwrite_shape_mismatch=True``."""
    from spec_tpu.models import convert_torch_camcalib_params

    sd = load_torch_state_dict(path)
    variables = convert_torch_camcalib_params(
        sd, backbone=backbone, num_fc_layers=num_fc_layers)
    if template is not None:
        variables = merge_with_template(variables, template)
    return _on_device(variables)


def load_spec_variables(path: str, backbone: str = 'resnet50',
                        template: Optional[dict] = None) -> dict:
    """Released SPEC ckpt -> flax variables (``spec_checkpoint.ckpt``,
    spec/tester.py:63-71). ``template`` enables shape-mismatch-tolerant
    loading (see :func:`merge_with_template`)."""
    from spec_tpu.models import convert_torch_hmr_params

    sd = load_torch_state_dict(path)
    variables = convert_torch_hmr_params(sd, backbone=backbone)
    if template is not None:
        variables = merge_with_template(variables, template)
    return _on_device(variables)


# ---------------------------------------------------------------------------
# Native (orbax) checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(directory: str, state, step: int, keep: int = 30):
    """Save a TrainState with orbax, keeping the ``keep`` most recent
    (the reference keeps top-30 by val loss, scripts/spec_train.py:92-98;
    ranking happens in the trainer which calls :func:`prune_checkpoints`).

    Multi-host: orbax's save is a COLLECTIVE (it barriers all processes
    internally), so every process must call this; orbax writes the data
    from the primary host. Host-side pruning runs on process 0 only."""
    import jax
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(directory, f'step_{step:08d}'), state,
                   force=True)
    if jax.process_index() == 0:
        _keep_latest(directory, keep)


def _step_dirs(directory: str) -> dict:
    """{step: dirname} for COMPLETE checkpoints only. An interrupted
    save leaves orbax temp dirs named
    ``step_NNNNNNNN.orbax-checkpoint-tmp-<ts>`` — naive
    ``int(d.split('_')[1])`` on those raises ValueError and bricks the
    resume path; they must be skipped (and never counted as restorable).
    """
    out = {}
    try:
        entries = os.listdir(directory)
    except (FileNotFoundError, NotADirectoryError):
        return out
    for d in entries:
        if not d.startswith('step_'):
            continue
        suffix = d[len('step_'):]
        if suffix.isdigit():
            out[int(suffix)] = d
    return out


def restore_checkpoint(directory: str, template, step: Optional[int] = None):
    """Restore the given (or latest) step into the ``template`` pytree."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    steps = _step_dirs(directory)
    if not steps:
        raise FileNotFoundError(f'no checkpoints in {directory}')
    step = max(steps) if step is None else step
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(directory, f'step_{step:08d}'), item=template)


def latest_step(directory: str) -> Optional[int]:
    steps = _step_dirs(directory)
    return max(steps) if steps else None


def load_orbax_variables(directory: str,
                         step: Optional[int] = None) -> dict:
    """Model variables from a SpecTrainer orbax checkpoint dir — the
    native train->eval product path (``spec_eval --ckpt
    <logdir>/checkpoints`` on a ``spec_train`` run; the reference can
    only evaluate its torch .ckpt files). Restores the raw TrainState
    pytree (no template needed) and keeps params/batch_stats only."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    steps = _step_dirs(directory)
    if not steps:
        raise FileNotFoundError(f'no checkpoints in {directory}')
    step = max(steps) if step is None else step
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.join(directory, f'step_{step:08d}'))
    variables = {'params': raw['params']}
    if raw.get('batch_stats'):
        variables['batch_stats'] = raw['batch_stats']
    return _on_device(variables)


def _keep_latest(directory: str, keep: int):
    import shutil

    steps = _step_dirs(directory)
    for n in sorted(steps)[:-keep]:
        shutil.rmtree(os.path.join(directory, steps[n]),
                      ignore_errors=True)


def find_resume_checkpoint_dir(current_logdir: str,
                               explicit: Optional[str] = None):
    """Locate a checkpoint to resume from.

    Every CLI invocation mints a fresh timestamped logdir
    (``logs/<script>/<exp>/<timestamp>_...``), so a crashed run's
    checkpoints never live in the CURRENT logdir. Search order (the
    reference's ``resume_training`` helper performs the same
    latest-run search): an explicit path if given (``TRAINING.RESUME``
    — a checkpoints dir, a run dir containing one, or a single
    ``step_NNNNNNNN`` dir which PINS that step), else the most recently
    modified SIBLING run of ``current_logdir`` that actually has
    checkpoints.

    Returns ``(checkpoints_dir, step)`` — ``step`` is the pinned step
    number from an explicit step dir, else None (= latest) — or None
    when nothing is found.
    """
    if explicit:
        base = os.path.basename(os.path.normpath(explicit))
        if base.startswith('step_') and os.path.isdir(explicit):
            # An explicit step dir pins THAT step — resolving to the
            # parent without it would silently load the latest instead.
            try:
                step = int(base.split('_')[1])
            except (IndexError, ValueError):
                step = None
            if step is not None:
                return os.path.dirname(os.path.abspath(explicit)), step
        for c in (explicit, os.path.join(explicit, 'checkpoints')):
            if latest_step(c) is not None:
                return c, None
        return None
    parent = os.path.dirname(os.path.abspath(current_logdir))
    if not os.path.isdir(parent):
        return None
    runs = [os.path.join(parent, d) for d in os.listdir(parent)
            if os.path.join(parent, d) != os.path.abspath(current_logdir)]
    runs = [r for r in runs if os.path.isdir(r)]
    runs.sort(key=os.path.getmtime, reverse=True)
    for r in runs:
        ck = os.path.join(r, 'checkpoints')
        if latest_step(ck) is not None:
            return ck, None
    return None
