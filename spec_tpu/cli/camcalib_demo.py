"""CamCalib inference CLI.

Mirror of reference ``scripts/camcalib_demo.py`` (flags, pickle fields
``{vfov, f_pix, pitch, roll}`` per image, horizon-line overlay PNGs) —
but batched + jitted per shape bucket on device instead of the
reference's per-image batch-1 python loop (:95-100).

Usage:
  python -m spec_tpu.cli.camcalib_demo --img_folder in/ --out_folder out/
"""

from __future__ import annotations

import argparse
import os
import time

import joblib
import numpy as np

from spec_tpu.core import bins
from spec_tpu.data.image_folder import ImageFolder, list_images
from spec_tpu.utils import paths
from spec_tpu.utils.vis import draw_horizon_line


# Process-level cache: repeated calls (e.g. the chunked video demo runs
# the folder pipeline once per chunk) must not reload the checkpoint or
# re-trace the jitted forward every time.
_MODEL_CACHE: dict = {}


def _get_model(ckpt: str, backbone: str, loss_type: str, min_size: int):
    import jax
    import jax.numpy as jnp
    from spec_tpu.models import CameraRegressorNetwork
    from spec_tpu.utils.checkpoints import load_camcalib_variables

    key = (ckpt, backbone, loss_type)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    model = CameraRegressorNetwork(backbone=backbone, num_fc_layers=1)
    if os.path.exists(ckpt):
        variables = load_camcalib_variables(ckpt, backbone=backbone)
    else:
        print(f'[camcalib] WARNING: checkpoint {ckpt} not found; '
              'using random init (angles will be meaningless)')
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, min_size, min_size, 3), jnp.float32))

    # Variables go in as ARGUMENTS, not closure constants: closed-over
    # arrays are baked into the HLO, so every fresh init would miss the
    # persistent compile cache (minutes through the remote-compile
    # tunnel) and bloat the compile payload.
    @jax.jit
    def infer(variables, batch_img):
        logits = model.apply(variables, batch_img)
        return logits, bins.convert_preds_to_angles(
            *logits, loss_type=loss_type)

    _MODEL_CACHE[key] = (model, variables, infer)
    return _MODEL_CACHE[key]


def run_camcalib_on_folder(
    img_folder: str,
    out_folder: str,
    ckpt: str = '',
    loss_type: str = 'softargmax_l2',
    backbone: str = 'resnet50',
    batch_size: int = 16,
    save_images: bool = True,
    min_size: int = 600,
    show_distributions: bool = False,
    image_list: list | None = None,
    gt_angles: dict | None = None,
):
    """Returns {imgname: {vfov, f_pix, pitch, roll}} and writes per-image
    pickles (the stage-1 -> stage-2 ABI the reference keeps,
    spec/utils/cam_params.py:24-49).

    ``image_list`` overrides folder listing (the reference's ``--dataset``
    mode builds the list from a registered npz's imgname column,
    scripts/camcalib_demo.py:59-64). ``gt_angles`` maps imgname ->
    (vfov, pitch, roll) in radians; when given, GT fields are added to the
    pickles and a second (GT) horizon is drawn, mirroring the reference's
    dataset-less evaluation mode (:142-171)."""
    import jax.numpy as jnp

    ckpt = ckpt or paths.camcalib_checkpoint_path()
    if image_list is None:
        image_list = list_images(img_folder)
    dataset = ImageFolder(image_list, min_size=min_size)

    # Output names: path relative to the input root with separators
    # flattened, so nested dataset imgnames (e.g. 3dpw
    # imageFiles/<seq>/image_00000.jpg) cannot collide. For a flat
    # --img_folder this reduces to the basename (the reference's naming,
    # scripts/camcalib_demo.py:97).
    if img_folder is not None:
        name_root = img_folder
    elif len(image_list) > 1:
        name_root = os.path.commonpath([os.path.dirname(p)
                                        for p in image_list])
    else:
        name_root = os.path.dirname(image_list[0]) if image_list else '.'

    def out_name(imgname: str) -> str:
        return os.path.relpath(imgname, name_root).replace(os.sep, '_')
    os.makedirs(out_folder, exist_ok=True)

    model, variables, infer = _get_model(ckpt, backbone, loss_type,
                                          min_size)

    results = {}
    t0 = time.perf_counter()
    n = 0
    for (h, w), idxs in dataset.shape_buckets().items():
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            items = [dataset[i] for i in chunk]
            # Pad the tail batch so every bucket compiles exactly once.
            padded = items + [items[-1]] * (batch_size - len(items))
            imgs = np.stack([it['img'] for it in padded])
            logits, (vfov, pitch, roll) = infer(variables, jnp.asarray(imgs))
            vfov, pitch, roll = (np.asarray(vfov), np.asarray(pitch),
                                 np.asarray(roll))
            for k, it in enumerate(items):
                orig_w, orig_h = it['orig_shape']
                f_pix = orig_h / 2.0 / np.tan(vfov[k] / 2.0)
                res = {
                    'vfov': np.float32(vfov[k]),
                    'f_pix': np.float32(f_pix),
                    'pitch': np.float32(pitch[k]),
                    'roll': np.float32(roll[k]),
                }
                base = out_name(it['imgname'])
                gt = (gt_angles or {}).get(it['imgname'])
                if gt is not None:
                    gt_vfov, gt_pitch, gt_roll = (float(x) for x in gt)
                    res.update({
                        'gt_vfov': np.float32(gt_vfov),
                        'gt_f_pix': np.float32(
                            orig_h / 2.0 / np.tan(gt_vfov / 2.0)),
                        'gt_pitch': np.float32(gt_pitch),
                        'gt_roll': np.float32(gt_roll),
                    })
                joblib.dump(res, os.path.join(out_folder, base + '.pkl'))
                results[it['imgname']] = res
                n += 1
                if save_images:
                    from PIL import Image
                    pil = Image.open(it['imgname']).convert('RGB')
                    if gt is not None:
                        from spec_tpu.utils.vis import gt_vs_pred_horizon
                        vis = gt_vs_pred_horizon(
                            np.asarray(pil), gt,
                            (vfov[k], pitch[k], roll[k]))
                    else:
                        vis = draw_horizon_line(
                            np.asarray(pil), vfov[k], pitch[k], roll[k])
                    Image.fromarray(vis).save(
                        os.path.join(out_folder, base))
                if show_distributions:
                    _plot_distributions(
                        [np.asarray(l)[k] for l in logits],
                        os.path.join(out_folder, base + '_dist.png'))
    dt = time.perf_counter() - t0
    print(f'[camcalib] {n} images in {dt:.2f}s ({n / max(dt, 1e-6):.1f} '
          'img/s incl. IO)')
    return results


def _plot_distributions(logit_rows, out_path):
    """Raw 256-bin distribution bar plots per angle (the reference's
    --show option, scripts/camcalib_demo.py:176-215) saved to disk."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    for ax, logits, name in zip(axes, logit_rows,
                                ('vfov', 'pitch', 'roll')):
        p = np.exp(logits - logits.max())
        ax.bar(np.arange(len(p)), p / p.sum(), width=1.0)
        ax.set_title(name)
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)


def _dataset_image_list(name: str) -> list:
    """Unique full-image paths of a registered SPEC dataset (the
    reference's ``--dataset`` mode, scripts/camcalib_demo.py:59-64)."""
    annot = paths.dataset_files()[name]
    folder = paths.dataset_folders()[name]
    imgs = np.load(annot, allow_pickle=True)['imgname']
    return sorted({os.path.join(folder, str(x)) for x in imgs})


def _pano_val_inputs(dataset: str = 'pano_scalenet'):
    """Image list + GT angles of the pano val split (the reference's
    dataset-less evaluation mode, scripts/camcalib_demo.py:66-70,142-171)."""
    import json

    from spec_tpu.data.pano_dataset import CameraRegressorDataset

    folder = paths.dataset_folders().get('pano360', 'data/pano360')
    ds = CameraRegressorDataset(folder, dataset=dataset, is_train=False)
    image_list, gt = [], {}
    for nm in ds.image_filenames:
        imgname = os.path.join(folder, 'images', nm)
        with open(ds._annot_path(imgname)) as f:
            data = json.load(f)
        vfov = (np.radians(float(data['vfov'])) if dataset == 'pano'
                else float(data['vfov']))
        image_list.append(imgname)
        gt[imgname] = (vfov, float(data['pitch']), float(data['roll']))
    return image_list, gt


def main(argv=None):
    parser = argparse.ArgumentParser(description='CamCalib demo (TPU)')
    parser.add_argument('--img_folder', type=str, default=None,
                        help="input folder; '-' with no --dataset runs "
                             'the pano val split with GT comparison')
    parser.add_argument('--out_folder', type=str, required=True)
    parser.add_argument('--dataset', type=str, default=None,
                        help='registered SPEC dataset name to run on')
    parser.add_argument('--loss', type=str, default='softargmax_l2')
    parser.add_argument('--ckpt', type=str, default='')
    parser.add_argument('--backbone', type=str, default='resnet50')
    parser.add_argument('--batch_size', type=int, default=16)
    parser.add_argument('--min_size', type=int, default=600,
                        help='aspect-preserving resize target (reference '
                             'Resize(600), pano_dataset.py:184-220)')
    parser.add_argument('--no_save', action='store_true',
                        help='do not save horizon-line images')
    parser.add_argument('--show', action='store_true',
                        help='save raw bin-distribution bar plots')
    args = parser.parse_args(argv)

    from spec_tpu.utils.paths import enable_compilation_cache
    enable_compilation_cache()

    if args.img_folder is None and args.dataset is None:
        parser.error("give --img_folder DIR, --dataset NAME, or "
                     "--img_folder - (pano val split with GT comparison)")
    img_folder = None if args.img_folder == '-' else args.img_folder
    image_list, gt_angles = None, None
    if img_folder is None:
        if args.dataset is not None:
            image_list = _dataset_image_list(args.dataset)
        else:
            image_list, gt_angles = _pano_val_inputs()

    run_camcalib_on_folder(
        img_folder, args.out_folder, ckpt=args.ckpt,
        loss_type=args.loss, backbone=args.backbone,
        batch_size=args.batch_size, save_images=not args.no_save,
        min_size=args.min_size, show_distributions=args.show,
        image_list=image_list, gt_angles=gt_angles)


if __name__ == '__main__':
    main()
