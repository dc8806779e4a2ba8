set -e
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
rm -rf /tmp/pol4
# Capacity-matched POL scene (RUNS_r4.md §5): the flagship 8x256 model
# memorizes the old 8-view 64x64 sphere per-view (queue E/F bisection:
# a 4x128 net on the same recipe reads 23.5 PSNR held-out; the big net
# reads 8-14). 16 views at 128x128 with 4 interleaved holdouts gives the
# big model enough signal to be TESTED rather than memorized.
FLAG="--set dataset_type=synthetic --set backbone=vanilla \
 --set synthetic_views=16 --set synthetic_hw=128 --set synthetic_n_test=4 \
 --set synthetic_interleave_test=true \
 --set N_samples=64 --set N_importance=128 --set N_rand=4096 \
 --set n_patches=4 --set patch_size=16 --set hardmask=true \
 --set with_depth_loss=true --set white_bkgd=true \
 --set compute_dtype=bfloat16 \
 --set basedir=/tmp/pol4 --set expname=van \
 --set i_print=500 --set checkpoint_every=2000 --set use_tensorboard=false"
echo "=== flagship 8k-step train (one-pass default path) ==="
timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG --num-steps 8000
echo "=== eval ==="
timeout 2400 python -m consistentnerf_tpu.cli.eval $FLAG --set eval_disable_lpips=true
echo "=== POL4 DONE ==="
