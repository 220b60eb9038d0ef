#!/bin/bash
# From-NeRF cross-validation: run the REFERENCE's own pipeline front
# (TF-CPU, /root/reference) -- NeRF -> geometry_from_nerf distillation
# -> shape pretrain -> joint optimization -- on the same analytic-sphere
# scene and schedules as our from-NeRF anchor (tools/quality_e2e.py
# --from_nerf defaults: 32px, NeRF 600 ep @ 5e-4 w/ 32+64 samples,
# light_h=8 (128-dir march, lvis_far 2.5, occu_thres 0.5), BRDF prior
# 200 ep, shape 100 ep, joint 150 ep, 512 rays/step, width-64 MLPs),
# then report the reference's own final vali PSNR. This closes the last
# uncross-validated pipeline regime (VERDICT r2 missing #1): our
# 36.82 dB from-NeRF anchor gets a reference counterpart produced by
# /root/reference's unmodified code (geometry_from_nerf.py:63-400).
#
# Usage: WK=/tmp/ref_fromnerf bash tools/ref_fromnerf_xval.sh
# Stages are skip-if-done, so the script is restart-safe.
set -e
export PYTHONDONTWRITEBYTECODE=1
export TF_USE_LEGACY_KERAS=1
export CUDA_VISIBLE_DEVICES=""

WK=${WK:-/tmp/ref_fromnerf}
IMH=${IMH:-32}
LIGHT_H=${LIGHT_H:-8}
MLP="mlp_width=64,mlp_depth=4,mlp_skip_at=2,mlp_chunk=65536"
EP_NERF=${EP_NERF:-600}
EP_BRDF=${EP_BRDF:-200}
EP_SHAPE=${EP_SHAPE:-100}
EP_JOINT=${EP_JOINT:-150}
NRAYS=${NRAYS:-512}
LPIX_CHUNK=${LPIX_CHUNK:-16}

DATA=$WK/data
OUT=$WK/out
mkdir -p $WK /tmp/empty_env

# The reference's compute_light_visibility writes a per-view lvis mp4
# through matplotlib's FFMpegWriter; this image has no ffmpeg, which
# ABORTS the whole distillation after the first view. Shim a no-op
# ffmpeg (consumes piped frames, touches the output) -- the mp4 is a
# visualization artifact, not an input to any later stage.
FAKEBIN=$WK/fakebin
mkdir -p $FAKEBIN
cat > $FAKEBIN/ffmpeg <<'SH'
#!/bin/sh
out=""
for last; do out="$last"; done
cat > /dev/null 2>&1 || true
case "$out" in
  *.mp4|*.webm|*.mov|*.avi) : > "$out" 2>/dev/null || true;;
esac
echo "ffmpeg version 4.0-fake (nerfactor-tpu shim)"
exit 0
SH
chmod +x $FAKEBIN/ffmpeg
export PATH=$FAKEBIN:$PATH

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

# ------ Stage 0a: reference NeRF (quality_e2e --from_nerf front)
if [ ! -f $OUT/nerf/lr5e-4/checkpoints/ckpt-1.index ]; then
  python trainvali.py --device=cpu --config=nerf.ini \
    --config_override="data_root=$DATA,outroot=$OUT/nerf,imh=$IMH,epochs=$EP_NERF,ckpt_period=$EP_NERF,vali_period=$EP_NERF,vali_batches=2,n_rays_per_step=$NRAYS,n_samples_coarse=32,n_samples_fine=64,near=2,far=6,$MLP,lr=5e-4" \
    2>&1 | grep -v "it/s\]\|it\]" | tail -3
fi

python - <<EOF
import glob, json, os
vali = sorted(glob.glob('$OUT/nerf/lr5e-4/vis_vali/epoch*'))
if vali:
    metas = sorted(glob.glob(os.path.join(vali[-1], 'batch*',
                                          'metadata.json')))
    psnrs = []
    for m in metas:
        with open(m) as h:
            d = json.load(h)
        if 'psnr' in d:
            psnrs.append((d['id'], d['psnr']))
    print('REFERENCE_NERF_VALI_PSNR',
          json.dumps({'per_view_psnr': psnrs,
                      'mean_psnr': sum(p for _, p in psnrs) / len(psnrs)}))
EOF

# ------ Stage 0b: reference geometry distillation (its own code,
# per-view Python loop; lpix_chunk only batches light pixels)
if [ ! -d $OUT/surf/train_000 ]; then
  python geometry_from_nerf.py \
    --trained_nerf=$OUT/nerf/lr5e-4 --data_root=$DATA \
    --out_root=$OUT/surf --imh=$IMH --light_h=$LIGHT_H \
    --lvis_far=2.5 --occu_thres=0.5 --mlp_chunk=65536 \
    --lpix_chunk=$LPIX_CHUNK \
    2>&1 | grep -v "it/s\]\|it\]" | tail -3
fi

# ------ Stage 1: reference BRDF prior
if [ ! -f $OUT/merl/lr1e-2/checkpoints/ckpt-1.index ]; then
  python trainvali.py --device=cpu --config=brdf.ini \
    --config_override="data_root=$DATA/brdf_npz,outroot=$OUT/merl,epochs=$EP_BRDF,ckpt_period=$EP_BRDF,vali_period=100000,n_rays_per_step=512,$MLP,lr=1e-2" \
    2>&1 | grep -v "it/s\]\|it\]" | tail -3
fi

# ------ Stage 2: reference shape distillation from the DISTILLED buffers
if [ ! -f $OUT/shape/lr1e-2/checkpoints/ckpt-1.index ]; then
  python trainvali.py --device=cpu --config=shape.ini \
    --config_override="data_root=$DATA,data_nerf_root=$OUT/surf,outroot=$OUT/shape,imh=$IMH,light_h=$LIGHT_H,epochs=$EP_SHAPE,ckpt_period=$EP_SHAPE,vali_period=100000,n_rays_per_step=$NRAYS,$MLP,lr=1e-2,use_nerf_alpha=false" \
    2>&1 | grep -v "it/s\]\|it\]" | tail -3
fi

# ------ Stage 3: reference joint optimization, vali at the end
python trainvali.py --device=cpu --config=nerfactor.ini \
  --config_override="data_root=$DATA,data_nerf_root=$OUT/surf,outroot=$OUT/nerfactor,brdf_model_ckpt=$OUT/merl/lr1e-2/checkpoints/ckpt-1,shape_mode=finetune,shape_model_ckpt=$OUT/shape/lr1e-2/checkpoints/ckpt-1,test_envmap_dir=/tmp/empty_env,imh=$IMH,light_h=$LIGHT_H,epochs=$EP_JOINT,ckpt_period=$EP_JOINT,vali_period=$EP_JOINT,vali_batches=2,n_rays_per_step=$NRAYS,$MLP,lr=5e-3" \
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
print('REFERENCE_FROMNERF_VALI_PSNR',
      json.dumps({'per_view_psnr': psnrs,
                  'mean_psnr': sum(p for _, p in psnrs) / len(psnrs)}))
EOF
