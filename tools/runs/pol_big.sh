set -e
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
rm -rf /tmp/polbig
# Same capacity-matched scene as pol_flagship.sh; N_rand=16384 is the
# big-batch decision row (adopt if rays/s lifts at equal quality).
FLAG="--set dataset_type=synthetic --set backbone=vanilla \
 --set synthetic_views=16 --set synthetic_hw=128 --set synthetic_n_test=4 \
 --set synthetic_interleave_test=true \
 --set N_samples=64 --set N_importance=128 --set N_rand=16384 \
 --set n_patches=4 --set patch_size=16 --set hardmask=true \
 --set with_depth_loss=true --set white_bkgd=true \
 --set compute_dtype=bfloat16 \
 --set basedir=/tmp/polbig --set expname=van \
 --set i_print=500 --set checkpoint_every=2000 --set use_tensorboard=false"
echo "=== flagship 8k-step big-batch train (one-pass default path) ==="
timeout 3500 python -m consistentnerf_tpu.cli.train $FLAG --num-steps 8000
echo "=== eval ==="
timeout 2400 python -m consistentnerf_tpu.cli.eval $FLAG --set eval_disable_lpips=true
echo "=== POLBIG DONE ==="
