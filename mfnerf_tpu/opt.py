"""CLI flag surface — mirrors the reference opt.py exactly, plus TPU extras.

Every reference flag (opt.py:3-95) is preserved with the same name, default
and semantics so benchmark scripts port 1:1. TPU-specific additions are
grouped at the bottom and all have safe defaults.
"""
import argparse


def get_opts(argv=None):
    parser = argparse.ArgumentParser()

    # dataset parameters
    parser.add_argument('--root_dir', type=str, required=True,
                        help='root directory of dataset')
    parser.add_argument('--dataset_name', type=str, default='nsvf',
                        choices=['nerf', 'nsvf', 'colmap', 'nerfpp', 'rtmv'],
                        help='which dataset to train/test')
    parser.add_argument('--split', type=str, default='train',
                        choices=['train', 'trainval', 'trainvaltest'],
                        help='use which split to train')
    parser.add_argument('--downsample', type=float, default=1.0,
                        help='downsample factor (<=1.0) for the images')

    # model parameters
    parser.add_argument('--scale', type=float, default=0.5,
                        help='scene scale (whole scene must lie in '
                             '[-scale, scale]^3')
    parser.add_argument('--use_exposure', action='store_true', default=False,
                        help='whether to train in HDR-NeRF setting')

    # loss parameters
    parser.add_argument('--distortion_loss_w', type=float, default=0,
                        help='''weight of distortion loss (see losses.py),
                        0 to disable (default), to enable,
                        a good value is 1e-3 for real scene and 1e-2 for
                        synthetic scene''')

    # training options
    parser.add_argument('--batch_size', type=int, default=8192,
                        help='number of rays in a batch')
    parser.add_argument('--ray_sampling_strategy', type=str,
                        default='all_images',
                        choices=['all_images', 'same_image'],
                        help='''
                        all_images: uniformly from all pixels of ALL images
                        same_image: uniformly from all pixels of a SAME image
                        ''')
    parser.add_argument('--num_epochs', type=int, default=30,
                        help='number of training epochs')
    parser.add_argument('--num_gpus', type=int, default=1,
                        help='number of chips for data parallelism (kept '
                             'under its reference name; maps to the JAX '
                             'device mesh size)')
    parser.add_argument('--lr', type=float, default=1e-2,
                        help='learning rate')
    # experimental training options
    parser.add_argument('--optimize_ext', action='store_true', default=False,
                        help='whether to optimize extrinsics')
    parser.add_argument('--pose_lr', type=float, default=1e-6,
                        help='[tpu extra] learning rate of the dR/dT pose '
                             'refinement (--optimize_ext); default matches '
                             'the reference\'s hard-coded value '
                             '(train.py:139)')
    parser.add_argument('--random_bg', action='store_true', default=False,
                        help='''whether to train with random bg color (real
                        scene only) to avoid objects with black color to be
                        predicted as transparent''')

    # validation options
    parser.add_argument('--eval_lpips', action='store_true', default=False,
                        help='evaluate lpips metric (needs VGG weights)')
    parser.add_argument('--val_only', action='store_true', default=False,
                        help='run only validation (need to provide ckpt_path)')
    parser.add_argument('--no_save_test', action='store_true', default=False,
                        help='whether to save test image and video')

    # misc
    parser.add_argument('--exp_name', type=str, default='exp',
                        help='experiment name')
    parser.add_argument('--ckpt_path', type=str, default=None,
                        help='pretrained checkpoint to load (including '
                             'optimizers, etc)')
    parser.add_argument('--weight_path', type=str, default=None,
                        help='pretrained checkpoint to load (excluding '
                             'optimizers, etc)')

    # network config
    parser.add_argument('--grid', type=str, default='Hash',
                        choices=['Hash', 'Window', 'MixedFeature', 'LowRank'],
                        help='Encoding scheme: Hash/Window/MixedFeature '
                             '(reference parity) or LowRank (the all-matmul '
                             'TPU-native encoding, see ops/lowrank.py)')
    parser.add_argument('--L', type=int, default=16,
                        help='Encoding hyper parameter L')
    parser.add_argument('--F', type=int, default=2,
                        help='Encoding hyper parameter F')
    parser.add_argument('--T', type=int, default=19,
                        help='Encoding hyper parameter T')
    parser.add_argument('--N_min', type=int, default=16,
                        help='Encoding hyper parameter N_min')
    parser.add_argument('--N_max', type=int, default=2048,
                        help='Encoding hyper parameter N_max')
    parser.add_argument('--N_tables', type=int, default=1,
                        help='Number of hash tables')

    parser.add_argument('--rgb_channels', type=int, default=64,
                        help='rgb network channels')
    parser.add_argument('--rgb_layers', type=int, default=2,
                        help='rgb network layers')

    parser.add_argument('--seed', type=int, default=1337,
                        help='random seed')

    # ------------------------------------------------------------ TPU extras
    parser.add_argument('--s_max_train', type=int, default=64,
                        help='[tpu] static per-ray sample budget (train); '
                             'over-budget rays sample stratified along the '
                             'ray (measured quality-neutral vs 128 at 1.7x '
                             'the speed, docs/TPU_NOTES.md)')
    parser.add_argument('--s_max_test', type=int, default=256,
                        help='[tpu] static per-ray sample budget (test)')
    parser.add_argument('--test_chunk', type=int, default=16384,
                        help='[tpu] rays per test-render chunk')
    parser.add_argument('--lpips_weights', type=str, default=None,
                        help='[tpu] npz with VGG16+LPIPS weights (enables '
                             '--eval_lpips without torchvision)')
    parser.add_argument('--profile', action='store_true', default=False,
                        help='[tpu] capture a jax.profiler trace of a few '
                             'training steps')
    parser.add_argument('--bf16', action='store_true', default=False,
                        help='[tpu] bfloat16 matmul compute (2x MXU '
                             'throughput; fp32 params/accumulation)')
    parser.add_argument('--lr_levels', type=int, default=8,
                        help='[tpu] LowRank: number of resolution levels')
    parser.add_argument('--lr_rank', type=int, default=16,
                        help='[tpu] LowRank: CP rank per level')
    parser.add_argument('--lr_frames', type=int, default=2,
                        help='[tpu] LowRank: rotated coordinate frames')
    parser.add_argument('--lr_k_min', type=int, default=32,
                        help='[tpu] LowRank: coarsest 1D resolution')
    parser.add_argument('--lr_k_max', type=int, default=512,
                        help='[tpu] LowRank: finest 1D resolution')
    parser.add_argument('--lr_fused', type=int, default=1,
                        help='[tpu] LowRank: fused nested-level evaluation '
                             '(levels snapped to a nested 2^m+1 ladder and '
                             'folded into one full-MXU-lane bf16 matmul per '
                             'axis). 1 (default) on; 0 restores the '
                             'per-level fp32 path')
    parser.add_argument('--hash_grad_samples', type=int, default=8,
                        choices=[1, 2, 4, 8],
                        help='[tpu] Hash/Window/MixedFeature grids: corners '
                             '(of 8) receiving backward scatter-add updates, '
                             'sampled by trilinear weight (exactly unbiased). '
                             '8 = exact backward. Lower values cut the '
                             'scatter-add wall that dominates hash-family '
                             'training on TPU (docs/TPU_NOTES.md)')
    parser.add_argument('--refresh_half', action=argparse.BooleanOptionalAction,
                        default=True,
                        help='[tpu] occupancy refresh evaluates alternating '
                             'even/odd-Morton cell halves (halves the dense '
                             'refresh cost; the skipped half decays exactly '
                             'like the reference\'s unsampled cells). '
                             'Measured quality-neutral and ~0.5 ms/step '
                             'faster at the bench config (r4); '
                             '--no-refresh_half restores the full refresh')
    parser.add_argument('--grid_size', type=int, default=128,
                        help='[tpu] occupancy grid resolution (reference '
                             'fixes 128)')
    parser.add_argument('--max_samples', type=int, default=1024,
                        help='[tpu] max marched samples per ray (reference '
                             'fixes MAX_SAMPLES=1024)')
    parser.add_argument('--steps_per_epoch', type=int, default=1000,
                        help='[tpu] steps per epoch (reference fixes 1000; '
                             'lower for smoke tests)')
    parser.add_argument('--s_flat', type=int, default=16,
                        help='[tpu] flat (ragged) sample evaluation budget '
                             'per ray; 0 keeps the padded rows. The default '
                             '16 covers the synthetic-scene steady state '
                             '(rm_s ~12) and is the benchmarked fast path '
                             '(padded 20.1 vs flat 12.9 ms/step at the r4 '
                             'bench config); early high-rm_s steps run '
                             'padded automatically (train.py FLAT_AFTER), '
                             'and multi-cascade scenes (scale > 0.5) force '
                             '0 — their rm_s ~50 would overflow the flat '
                             'budget and destabilize training (measured)')
    parser.add_argument('--pool_a', type=int, default=4,
                        help='[tpu] TRAINING-march stage-A pooling factor '
                             '(single-cascade scenes): 0 uses the G/2 '
                             'coarse table; the default G/4 table\'s 8^3 '
                             'neighborhood rows cover ~3x more strata per '
                             'gather — fewer stage-A row gathers at the '
                             'cost of stage-A false positives the exact '
                             'stage-B test discards (models/ngp.py '
                             'NGPConfig.pool_a; measured 12.5 -> 11.1 '
                             'ms/step, quality-neutral). Test rendering '
                             'always keeps the G/2 table. Ignored (0) when '
                             'grid_size is not divisible by it')
    parser.add_argument('--wavefront', type=str, default='auto',
                        help='[tpu] test/validation renderer: "auto" keeps '
                             'the RenderConfig default (persistent-pool '
                             'wavefront, the measured winner), "none" falls '
                             'back to the round-schedule renderer, or '
                             '"P,seek,window,cap" sets an explicit pool '
                             'config; P may be a colon-separated descending '
                             'pool-size cascade, e.g. "32768:2048,0,128,16" '
                             '(see models/rendering.py '
                             '_render_test_wavefront)')
    parser.add_argument('--multihost', action='store_true', default=False,
                        help='[tpu] call jax.distributed.initialize() for '
                             'multi-host (DCN) runs; the data mesh then '
                             'spans all hosts\' chips and validation '
                             'metrics aggregate across processes')

    return parser.parse_args(argv)
