"""Typed configuration mirroring the reference's flag surface.

Flag names/semantics follow reference utils/train_options.py:16-83 (training)
and :86-94 (test), with real booleans instead of the reference's stringly
flags (its `--parallel` was a truthy string — a quirk catalogued in
SURVEY.md §5). Defaults encode the paper recipe; `from_args` exposes the same
CLI names so `run_train_val.sh`-style invocations carry over.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


def str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


@dataclass
class TrainConfig:
    # dataset / task
    data_set: str = "cityscapes"  # cityscapes | voc | camvid | synthetic
    data_dir: str = ""
    data_list: str = "dataset/list/cityscapes/train.lst"
    val_data_list: str = "dataset/list/cityscapes/val.lst"
    classes_num: int = 19
    ignore_label: int = 255
    input_size: Tuple[int, int] = (512, 512)
    # NOTE: programmatic default True, but the CLI flags are store_true and so
    # default False — exactly the reference's argparse semantics
    # (train_options.py:34-37 + run_train_val.sh passes --random-mirror
    # --random-scale explicitly). Scripted runs must pass the flags.
    random_scale: bool = True
    random_mirror: bool = True

    # checkpoints
    T_ckpt_path: str = ""
    S_ckpt_path: str = "./ckpt/save_path/Student"
    D_ckpt_path: str = "./ckpt/save_path/Discriminator"
    S_resume: bool = False
    D_resume: bool = False
    is_student_load_imgnet: bool = False
    student_pretrain_model_imgnet: str = ""
    snapshot_dir: str = "./snapshots/"
    log_path: str = "./ckpt/log/save_path"

    # optimization (reference defaults; run_train_val.sh uses wd 5e-4)
    batch_size: int = 8
    num_steps: int = 40000
    last_step: int = 0
    # accepted for reference-CLI compatibility; the loop is step-based, so
    # these only flow into checkpoint metadata (reference train_options.py)
    start_epoch: int = 0
    epoch_nums: int = 1
    lr_g: float = 1e-2
    lr_d: float = 4e-4
    momentum: float = 0.9
    weight_decay: float = 1e-4
    power: float = 0.9

    # task-loss variant (reference default is plain DSN; OHEM available,
    # reference utils/criterion.py:190-209)
    ohem: bool = False
    ohem_thresh: float = 0.7
    ohem_min_kept: int = 100000

    # distillation terms
    pi: bool = True
    pa: bool = True
    ho: bool = True
    lambda_pi: float = 10.0
    lambda_pa: float = 1.0
    lambda_d: float = 0.1
    lambda_gp: float = 10.0
    pool_scale: float = 0.5

    # adversarial
    adv_loss_type: str = "wgan-gp"  # wgan-gp | hinge
    imsize_for_adv: int = 65
    adv_conv_dim: int = 64
    preprocess_gan_mode: int = 1

    # model family
    student_arch: str = "resnet18"  # resnet18 (PSPNet head) | espnet (ESPNet-C)
    teacher_layers: Tuple[int, ...] = (3, 4, 23, 3)  # R101; smaller for smoke runs

    # TPU-native knobs (no reference counterpart)
    compute_dtype: str = "bfloat16"  # bfloat16 | float32 for conv compute
    fused_ce: str = "auto"  # auto (Pallas kernel on TPU) | true | false
    flat_sgd: bool = False  # single-vector SGD update (fewer tiny dispatches)
    # rematerialize student residual blocks in the backward (jax.checkpoint):
    # trades one extra student forward for O(depth) less activation memory —
    # enables larger batches/crops on a fixed HBM budget; numerics unchanged
    remat: bool = False
    # space-to-depth folded stem conv1 (models/resnet_pspnet._StemS2DConv1):
    # exact parity (values+grads; canonical param tree preserved — same
    # checkpoints), measured +0.6% full-recipe throughput on v5e (153.4 vs
    # 152.5 img/s/chip, ROADMAP round-4); odd-geometry inputs fall back to
    # the plain conv. Default ON, same policy as the factored PSP bottleneck
    # (parity-preserving rewrites that measure faster ship as the default).
    stem_s2d: bool = True
    # host→device wire format: auto = bf16 images + uint8 labels under bf16
    # compute; u8 = re-quantized uint8 images (another 2x; exact for never-
    # padded crops, pad pixels round by <0.5/255); f32 = no narrowing
    wire_format: str = "auto"
    # BGR mean used to re-quantize/de-quantize u8-wire images on device
    # (cityscapes/voc value; __post_init__ swaps in the dataset-specific
    # mean so direct KDTrainer use — not just cli.train — gets it right)
    input_mean_bgr: Tuple[float, float, float] = (104.00698793, 116.66876762,
                                                  122.67891434)
    num_data_shards: int = 1  # data-parallel mesh size (per slice)
    num_model_shards: int = 1  # tensor-parallel mesh size (teacher/student channels)
    num_slices: int = 1  # TPU slices (dcn mesh axis; cross-slice data parallel)
    num_spatial_shards: int = 1  # image-height sharding (sp mesh axis)
    unroll_steps: int = 1  # device-loop: optimizer steps per dispatch (lax.scan)
    decode_cache_dir: str = ""  # one-time PNG decode to raw .npy + mmap reads
    num_workers: int = 0  # decode/augment worker processes (0 = in-process)
    seed: int = 0
    log_every: int = 10
    profile_dir: str = ""  # if set, jax.profiler traces steps [10, 10+profile_steps)
    profile_steps: int = 5
    eval_every: int = 0  # 0 => reference schedule (last 1000 steps, every 2975/batch)
    best_mean_IU: float = 0.0
    # published-eval-mode in-training validation (reference evaluate.py:115-134
    # multiscale+flip semantics; the reference trainer validates single-scale
    # only — these let --scales/--flip validate the way cli.eval reports)
    scales: Tuple[float, ...] = (1.0,)
    flip: bool = False

    # per-dataset BGR means (CamVid value == data.camvid.CAMVID_MEAN; a test
    # asserts the two stay in sync — config cannot import data without a cycle)
    _DATASET_MEAN_BGR = {"camvid": (105.39, 108.85, 110.44)}

    def __post_init__(self):
        default = type(self).__dataclass_fields__["input_mean_bgr"].default
        if (tuple(self.input_mean_bgr) == tuple(default)
                and self.data_set in self._DATASET_MEAN_BGR):
            self.input_mean_bgr = self._DATASET_MEAN_BGR[self.data_set]

    @property
    def eval_save_steps(self) -> int:
        # reference train_and_eval.py:18 — save_steps = 2975 // batch_size
        return max(2975 // self.batch_size, 1)

    def should_eval(self, step: int) -> bool:
        """Reference schedule (train_and_eval.py:27): eval in the final 1000
        steps every `eval_save_steps`, and at num_steps-1."""
        if self.eval_every:
            return step > 0 and step % self.eval_every == 0
        return (
            step > 1
            and step % self.eval_save_steps == 0
            and step > self.num_steps - 1000
        ) or step == self.num_steps - 1

    @classmethod
    def from_args(cls, argv: Optional[list] = None) -> "TrainConfig":
        p = argparse.ArgumentParser(description="knowledge-distillation (TPU)")
        p.add_argument("--data-set", default=cls.data_set, type=str)
        p.add_argument("--data-dir", default=cls.data_dir, type=str)
        p.add_argument("--data-list", default=cls.data_list, type=str)
        p.add_argument("--val-data-list", default=cls.val_data_list, type=str)
        p.add_argument("--classes_num", default=cls.classes_num, type=int)
        p.add_argument("--ignore-label", default=cls.ignore_label, type=int)
        p.add_argument("--input-size", default="512,512", type=str)
        p.add_argument("--random-mirror", action="store_true")
        p.add_argument("--random-scale", action="store_true")
        p.add_argument("--T_ckpt_path", default=cls.T_ckpt_path, type=str)
        p.add_argument("--S_ckpt_path", default=cls.S_ckpt_path, type=str)
        p.add_argument("--D_ckpt_path", default=cls.D_ckpt_path, type=str)
        p.add_argument("--S_resume", default=False, type=str2bool)
        p.add_argument("--D_resume", default=False, type=str2bool)
        p.add_argument("--is-student-load-imgnet", default=False, type=str2bool)
        # accepted-and-ignored GPU-era flags so unmodified reference scripts
        # (run_train_val.sh passes --gpu 0 --parallel False) run as-is:
        # device placement is the mesh's job, --parallel was a truthy-string
        # bug (train_options.py:30), --is-training/--recurrence were unused.
        p.add_argument("--gpu", default="", type=str, help=argparse.SUPPRESS)
        p.add_argument("--parallel", default="", type=str, help=argparse.SUPPRESS)
        p.add_argument("--is-training", default="", type=str, help=argparse.SUPPRESS)
        p.add_argument("--recurrence", default=1, type=int, help=argparse.SUPPRESS)
        p.add_argument("--student-pretrain-model-imgnet", default="", type=str)
        p.add_argument("--snapshot-dir", default=cls.snapshot_dir, type=str)
        p.add_argument("--log-path", default=cls.log_path, type=str)
        p.add_argument("--batch-size", default=cls.batch_size, type=int)
        p.add_argument("--num-steps", default=cls.num_steps, type=int)
        p.add_argument("--last-step", default=0, type=int)
        p.add_argument("--start_epoch", default=0, type=int)
        p.add_argument("--epoch_nums", default=1, type=int)
        p.add_argument("--lr-g", default=cls.lr_g, type=float)
        p.add_argument("--lr-d", default=cls.lr_d, type=float)
        p.add_argument("--momentum", default=cls.momentum, type=float)
        p.add_argument("--weight-decay", default=cls.weight_decay, type=float)
        p.add_argument("--power", default=cls.power, type=float)
        p.add_argument("--pi", default=True, type=str2bool)
        p.add_argument("--pa", default=True, type=str2bool)
        p.add_argument("--ho", default=True, type=str2bool)
        p.add_argument("--lambda-pi", default=cls.lambda_pi, type=float)
        p.add_argument("--lambda-pa", default=cls.lambda_pa, type=float)
        p.add_argument("--lambda-d", default=cls.lambda_d, type=float)
        p.add_argument("--lambda-gp", default=cls.lambda_gp, type=float)
        p.add_argument("--pool-scale", default=cls.pool_scale, type=float)
        p.add_argument("--adv-loss-type", default=cls.adv_loss_type, type=str)
        p.add_argument("--imsize-for-adv", default=cls.imsize_for_adv, type=int)
        p.add_argument("--adv-conv-dim", default=cls.adv_conv_dim, type=int)
        p.add_argument("--preprocess-GAN-mode", dest="preprocess_gan_mode",
                       default=cls.preprocess_gan_mode, type=int)
        p.add_argument("--student-arch", default=cls.student_arch, type=str)
        p.add_argument("--teacher-layers", default="3,4,23,3", type=str)
        p.add_argument("--ohem", default=False, type=str2bool)
        p.add_argument("--ohem-thresh", default=cls.ohem_thresh, type=float)
        p.add_argument("--ohem-min-kept", default=cls.ohem_min_kept, type=int)
        p.add_argument("--compute-dtype", default=cls.compute_dtype, type=str)
        p.add_argument("--fused-ce", default=cls.fused_ce, type=str)
        p.add_argument("--flat-sgd", default=cls.flat_sgd, type=str2bool)
        p.add_argument("--remat", default=cls.remat, type=str2bool)
        p.add_argument("--stem-s2d", default=cls.stem_s2d, type=str2bool)
        p.add_argument("--wire-format", default=cls.wire_format, type=str,
                       choices=("auto", "u8", "f32"))
        p.add_argument("--num-data-shards", default=1, type=int)
        p.add_argument("--num-model-shards", default=1, type=int)
        p.add_argument("--num-slices", default=1, type=int)
        p.add_argument("--num-spatial-shards", default=1, type=int)
        p.add_argument("--unroll-steps", default=1, type=int)
        p.add_argument("--decode-cache-dir", default="", type=str)
        p.add_argument("--num-workers", default=0, type=int)
        p.add_argument("--seed", default=0, type=int)
        p.add_argument("--log-every", default=10, type=int)
        p.add_argument("--eval-every", default=0, type=int)
        p.add_argument("--best-mean-IU", default=0.0, type=float)
        p.add_argument("--scales", default="1.0", type=str,
                       help="in-training val multi-scale avg, e.g. 0.75,1.0")
        p.add_argument("--flip", default=False, type=str2bool)
        ns = p.parse_args(argv)
        h, w = map(int, ns.input_size.split(","))
        kwargs = {}
        field_names = {f.name for f in dataclasses.fields(cls)}
        for key, val in vars(ns).items():
            if key == "input_size":
                kwargs["input_size"] = (h, w)
            elif key == "teacher_layers":
                kwargs["teacher_layers"] = tuple(int(x) for x in val.split(","))
            elif key == "scales":
                kwargs["scales"] = tuple(float(s) for s in val.split(","))
            elif key in field_names:
                kwargs[key] = val
        return cls(**kwargs)


@dataclass
class TestConfig:
    """Mirrors reference TrainOptionsForTest (train_options.py:86-94)."""

    data_dir: str = ""
    data_list: str = "dataset/list/cityscapes/test.lst"
    resume_from: str = ""
    classes_num: int = 19
    output_dir: str = "outputs"
    whole: bool = True          # whole-image vs sliding-tile inference
    flip: bool = False          # flip-average
    scales: Tuple[float, ...] = (1.0,)  # multi-scale averaging
    data_set: str = "cityscapes"  # cityscapes | voc

    @classmethod
    def from_args(cls, argv: Optional[list] = None) -> "TestConfig":
        p = argparse.ArgumentParser(description="knowledge-distillation test (TPU)")
        p.add_argument("--data-set", default=cls.data_set, type=str)
        p.add_argument("--data-dir", default="", type=str)
        p.add_argument("--data-list", default=cls.data_list, type=str)
        p.add_argument("--resume-from", default="", type=str)
        p.add_argument("--classes_num", default=19, type=int)
        p.add_argument("--output-dir", default="outputs", type=str)
        p.add_argument("--whole", default=True, type=str2bool)
        p.add_argument("--flip", default=False, type=str2bool)
        p.add_argument("--scales", default="1.0", type=str,
                       help="comma-separated, e.g. 0.75,1.0,1.25")
        ns = p.parse_args(argv)
        kw = vars(ns)
        kw["scales"] = tuple(float(s) for s in kw["scales"].split(","))
        return cls(**kw)
