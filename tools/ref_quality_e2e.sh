#!/bin/bash
# Quality cross-validation: run the REFERENCE's own pipeline (TF-CPU,
# /root/reference) end-to-end on the exact scene + settings of our
# quality anchor (tools/quality_e2e.py: 32px analytic sphere, 8x16
# light sphere, width-64 MLPs, BRDF prior 200 ep -> shape 100 ep ->
# joint 150 ep), then report the reference's final vali PSNR from its
# own metadata.json files — numbers produced by the reference's code,
# for PARITY.md's reference-vs-repo table.
#
# Usage: WK=/tmp/ref_xval bash tools/ref_quality_e2e.sh
set -e
export PYTHONDONTWRITEBYTECODE=1
export TF_USE_LEGACY_KERAS=1
export CUDA_VISIBLE_DEVICES=""

WK=${WK:-/tmp/ref_xval}
IMH=${IMH:-32}
LIGHT_H=${LIGHT_H:-8}
MLP="mlp_width=64,mlp_depth=4,mlp_skip_at=2,mlp_chunk=65536"
EP_BRDF=${EP_BRDF:-200}
EP_SHAPE=${EP_SHAPE:-100}
EP_JOINT=${EP_JOINT:-150}
NRAYS=${NRAYS:-512}

DATA=$WK/data
OUT=$WK/out
mkdir -p $WK /tmp/empty_env

# ------ Scene + synthetic BRDF tables, EXACTLY as tools/quality_e2e.py
if [ ! -d $DATA/train_000 ]; then
  PYTHONPATH=/root/repo:/root/.axon_site WK=$WK IMH=$IMH LIGHT_H=$LIGHT_H \
    python - <<'EOF'
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from os.path import join
from tests import synth

wk = os.environ['WK']
imh, light_h = int(os.environ['IMH']), int(os.environ['LIGHT_H'])
root = join(wk, 'data')
synth.make_scene(root, n_train=8, n_vali=2, n_test=3, imh=imh,
                 with_buffers=True, light_h=light_h)
brdf_data = join(root, 'brdf_npz')
os.makedirs(brdf_data, exist_ok=True)
grid = np.stack(np.meshgrid(
    np.linspace(0, np.pi, 18), np.linspace(0, np.pi / 2, 9),
    np.linspace(0, np.pi / 2, 9), indexing='ij'), -1).reshape(-1, 3)
# 20 materials: the reference's BRDFMERLDataset hardcodes a 20-identity
# interpolation sweep (datasets/brdf_merl.py:52 np.random.choice(...,
# 20, replace=False)), so fewer materials crash it. Our side runs
# quality_e2e.py --n_materials=20 on the same tables.
materials = [('mat%02d' % i, v)
             for i, v in enumerate(np.linspace(0.05, 0.6, 20))]
for i, (name, val) in enumerate(materials):
    refl = val * np.ones((grid.shape[0], 1), np.float32)
    for mode in ('train', 'vali'):
        np.savez(join(brdf_data, '%s_%s.npz' % (mode, name)),
                 i=i, name=name, envmap_h=light_h, ims=64, spp=1,
                 rusink=grid.astype(np.float32), refl=refl)
np.savez(join(brdf_data, 'test.npz'), envmap_h=light_h, ims=64, spp=1,
         rusink=grid.astype(np.float32))
print('scene + brdf tables OK')
EOF
fi

export PYTHONPATH=/root/reference:/root/reference/nerfactor:/root/.axon_site
cd /root/reference/nerfactor

# ------ Stage 1: reference BRDF prior
# NOTE: the reference numbers checkpoints by SAVE COUNT (ckpt-1 after
# epochs/ckpt_period saves), not by epoch like ours.
if [ ! -f $OUT/merl/lr1e-2/checkpoints/ckpt-1.index ]; then
  python trainvali.py --device=cpu --config=brdf.ini \
    --config_override="data_root=$DATA/brdf_npz,outroot=$OUT/merl,epochs=$EP_BRDF,ckpt_period=$EP_BRDF,vali_period=100000,n_rays_per_step=512,$MLP,lr=1e-2" \
    2>&1 | grep -v "it/s\]\|it\]" | tail -3
fi

# ------ Stage 2: reference shape distillation
if [ ! -f $OUT/shape/lr1e-2/checkpoints/ckpt-1.index ]; then
  python trainvali.py --device=cpu --config=shape.ini \
    --config_override="data_root=$DATA,data_nerf_root=$DATA/surf,outroot=$OUT/shape,imh=$IMH,light_h=$LIGHT_H,epochs=$EP_SHAPE,ckpt_period=$EP_SHAPE,vali_period=100000,n_rays_per_step=$NRAYS,$MLP,lr=1e-2,use_nerf_alpha=false" \
    2>&1 | grep -v "it/s\]\|it\]" | tail -3
fi

# ------ Stage 3: reference joint optimization, vali at the end
python trainvali.py --device=cpu --config=nerfactor.ini \
  --config_override="data_root=$DATA,data_nerf_root=$DATA/surf,outroot=$OUT/nerfactor,brdf_model_ckpt=$OUT/merl/lr1e-2/checkpoints/ckpt-1,shape_mode=finetune,shape_model_ckpt=$OUT/shape/lr1e-2/checkpoints/ckpt-1,test_envmap_dir=/tmp/empty_env,imh=$IMH,light_h=$LIGHT_H,epochs=$EP_JOINT,ckpt_period=$EP_JOINT,vali_period=$EP_JOINT,vali_batches=2,n_rays_per_step=$NRAYS,$MLP,lr=5e-3" \
  2>&1 | grep -v "it/s\]\|it\]" | tail -5

# ------ Report the reference's own per-view vali PSNR
python - <<EOF
import glob, json, os
vali = sorted(glob.glob('$OUT/nerfactor/lr5e-3/vis_vali/epoch*'))
metas = sorted(glob.glob(os.path.join(vali[-1], 'batch*', 'metadata.json')))
psnrs = []
for m in metas:
    with open(m) as h:
        d = json.load(h)
    if 'psnr' in d:
        psnrs.append((d['id'], d['psnr']))
print('REFERENCE_VALI_PSNR',
      json.dumps({'per_view_psnr': psnrs,
                  'mean_psnr': sum(p for _, p in psnrs) / len(psnrs)}))
EOF
