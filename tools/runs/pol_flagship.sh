set -e
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
rm -rf /tmp/pol3
FLAG="--set dataset_type=synthetic --set backbone=vanilla \
 --set N_samples=64 --set N_importance=128 --set N_rand=4096 \
 --set n_patches=4 --set patch_size=16 --set hardmask=true \
 --set with_depth_loss=true --set white_bkgd=true --set synthetic_interleave_test=true \
 --set compute_dtype=bfloat16 \
 --set basedir=/tmp/pol3 --set expname=van \
 --set i_print=400 --set checkpoint_every=2000 --set use_tensorboard=false"
echo "=== flagship 4k-step train (one-pass default path) ==="
timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG --num-steps 4000
echo "=== eval ==="
timeout 1800 python -m consistentnerf_tpu.cli.eval $FLAG --set eval_disable_lpips=true
echo "=== POL3 DONE ==="
