"""Typed configuration for the whole pipeline.

The reference hard-codes every constant across its sources (SURVEY.md §5 "Config"):
image dims 640×480 and tile size 224 (reference src/scene.rs:36-37, src/yolact.rs:143-144,
207-214), camera FOVs 87°/58° and max depth 4000 mm (shaders/pt_cloud.comp:23-28),
avoidance/bump constants (pt_cloud.comp:32-39), the TCP bind address (src/path.rs:133),
and the model path (src/yolact.rs:19).  Here those constants become data: one frozen
dataclass tree with sensible defaults equal to the reference's values.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """RGB-D camera geometry (reference: RealSense D435 over OpenNI2).

    Defaults match shaders/pt_cloud.comp:23-28 — 640×480 frames, 87°×58° FOV,
    4 m depth clamp.
    """

    width: int = 640
    height: int = 480
    x_fov: float = 1.51843644924  # 87 deg, radians
    y_fov: float = 1.01229096616  # 58 deg, radians
    max_depth_mm: float = 4000.0
    fps: float = 30.0

    @property
    def n_pixels(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """YOLACT model family configuration.

    The reference ran a MobileNetV2-backbone YOLACT variant as a quantized tflite
    blob with a 224×224×3 u8 input and a 28×28×81 per-pixel class map output
    (data/FRC_model_edgetpu.log, src/yolact.rs:91,108).  We build the *full* YOLACT
    graph (backbone+FPN, protonet, prediction heads, semantic-seg head) from scratch.
    """

    name: str = "yolact_mnv2_fpn"
    backbone: str = "mobilenetv2"  # "mobilenetv2" | "resnet18" | "resnet50"
    input_size: tuple[int, int] = (256, 320)  # (H, W); any SAME-padded size works
    num_classes: int = 81  # COCO-style head width; channels 0-3 meaningful (§2.3)
    meaningful_classes: int = 4  # 0 bg, 1 red robot, 2 blue robot, 3 ball
    # Detection-head class count.  The reference's 81-way code space lives in
    # its semantic map output — which SemanticHead keeps at ``num_classes`` —
    # but its detection heads never existed (src/yolact.rs:92-94), so ours
    # carry only the meaningful classes: conf channels per position drop
    # A·81 → A·4 (the conf conv was ~60% of model FLOPs at A=9).
    det_num_classes: int = 4
    fpn_channels: int = 128
    fpn_levels: int = 5  # P3..P7
    num_prototypes: int = 32
    proto_channels: int = 128
    head_channels: int = 128
    anchor_aspect_ratios: tuple[float, ...] = (1.0, 0.5, 2.0)
    anchor_scales: tuple[float, ...] = (24.0, 48.0, 96.0, 192.0, 384.0)
    # Sub-octave scale multipliers per level (RetinaNet-style).  With 2×
    # geometric steps between levels, a single scale per level caps the best
    # achievable anchor↔gt IoU at (s/(s·2^½))² ≈ 0.5 for objects midway
    # between levels — almost nothing clears the matcher's 0.5 positive bar.
    # Three sub-octaves bound the size mismatch at 2^⅙ (worst-case IoU ≈ 0.79).
    anchor_scale_mults: tuple[float, ...] = (1.0, 2 ** (1 / 3), 2 ** (2 / 3))
    width_mult: float = 1.0  # MobileNetV2 width multiplier
    dtype: str = "bfloat16"  # compute dtype for conv stack (MXU-friendly)
    # Int8 end-to-end inference (models/qconv.py): s8 weights (per channel) ×
    # s8 activations (per tensor, dynamic) → s32 MXU accumulation — the
    # TPU-native parity mode for the reference's u8 tflite graph
    # (src/yolact.rs:172-177).  Loads the same float checkpoints.
    quantized: bool = False
    # Whether int8 preparation also quantizes depthwise kernels.  Off by
    # default: depthwise convs are VPU-bound (no MXU win), so quant/requant
    # there is pure overhead; they serve in bf16 inside the int8 graph.
    quantize_depthwise: bool = False
    # Quantization-aware training (with quantized=True): the training graph
    # fake-quantizes weights/activations in float with straight-through
    # gradients (models/qconv.py Conv8.qat), mirroring the static int8 serve
    # layout — per-cout weight scales, per-tensor activation scales, float
    # depthwise.  Checkpoints stay tree-identical to the float graph, so a
    # QAT run serves through the same prepare.py static-int8 pipeline.
    qat: bool = False
    # Serve/train depthwise convs as shifted multiply-adds (ops/depthwise.py)
    # instead of XLA's feature_group_count conv lowering.  Measured NEGATIVE
    # on v5e and default-off: the formulation wins 1.3-2.3x in *isolation* on
    # early stride-1 layers (where the conv pays a graph-boundary layout
    # copy), but inside the full backbone the convs chain layouts copy-free
    # and the elementwise blocks force layout round trips — batch-16 VGA
    # forward 6.69 -> 10.53 ms with it on (docs/performance.md).  Kept as an
    # exact, tested alternative formulation for narrow-channel stencil work.
    depthwise_shifted: bool = False
    # Space-to-depth stem (ops/s2d.py): compute the stride-2 3x3 RGB stem
    # conv as an exact 2x2 s1 conv on 2x2 space-to-depth input — 12-channel
    # lanes instead of 3 (the MXU-starved worst case) and 4x smaller spatial
    # grid.  Checkpoint-compatible (on-the-fly weight transform, identical
    # param tree); float path only (the int8 stem keeps the plain conv).
    # Measured NEGATIVE on v5e and default-off: the in-graph S2D transpose
    # costs more than the 3-channel stem conv it replaces — batch-16 VGA
    # forward 6.67 -> 7.93 ms (reshape/transpose S2D) and 13.4 ms (strided
    # slice+concat S2D); XLA's existing stem fusion is already the fastest
    # formulation here (docs/performance.md).  Kept as the exact, tested
    # alternative for toolchains where 3-channel convs lower worse.
    s2d_stem: bool = False
    # Detection post-processing
    max_detections: int = 32
    # calibrated on the pinned checkpoint's held-out scenes: true detections
    # score 0.96 on average, duplicates fall below 0.3 (detections/GT goes
    # 1.55 → 1.00 with recall@IoU50 0.97 — checkpoints/README.md)
    score_threshold: float = 0.3
    nms_iou_threshold: float = 0.5
    nms_top_k: int = 64
    mask_threshold: float = 0.5

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_aspect_ratios) * len(self.anchor_scale_mults)

    @property
    def strides(self) -> tuple[int, ...]:
        return tuple(8 * (2**i) for i in range(self.fpn_levels))


@dataclasses.dataclass(frozen=True)
class GeometryConfig:
    """Depth→birdseye occupancy fusion constants (shaders/pt_cloud.comp:30-39)."""

    bot_avoidance_const: float = 100.0
    bot_norm_const: int = 20  # robot bump radius, px
    terrain_norm_const: int = 10  # terrain bump radius, px
    bump_err: float = 0.1
    max_balls: int = 100  # Balls SSBO is vec4[100] (pt_cloud.comp:16-20)
    # Opt-in: run the terrain dilation as the strip-tiled Pallas kernel
    # (kernels/bump.py, hardware-validated exact) instead of the XLA-fused
    # shifted-max loop.  Off by default: measured in the fused serving graph
    # the XLA loop is faster on v5e (geometry/fusion.py occupancy_map).
    pallas_bump: bool = False


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    """Multi-source shortest-path planner (src/path.rs:25-120).

    The reference seeds at most 3 balls (path.rs:37) and backtracks from the
    bottom-center node 640·480−240 (path.rs:93).  ``backend`` selects the host
    C++ Dijkstra, a NumPy fallback, or on-TPU Bellman-Ford relaxation.
    """

    max_seed_balls: int = 3
    backend: str = "auto"  # "auto" | "native" | "numpy" | "tpu"
    # Start-node column offset from the grid's right edge: the reference's
    # START_NODE is H·W−240 → column W−240 (src/path.rs:93) — center on its
    # 640-wide grid only by accident of the constant.  Deployments where the
    # robot sits under the camera center set this to W/2 (tod_tpu/sim does).
    start_offset: int = 240
    tpu_max_iters: int = 2048  # Bellman-Ford iteration cap for the TPU backend
    # device path-walk step cap (plan_on_device): must exceed the longest
    # expected path; a straight VGA diagonal is ~640 hops and obstacle
    # detours add more (the host walk is uncapped)
    max_path_steps: int = 2048
    # minimum pixels behind a ball-centroid slot before it may seed the
    # search — suppresses phantom slots from fringe pixels of duplicate
    # detections surviving Fast-NMS
    min_ball_pixels: float = 3.0
    # Native height backend: bidirectional Dial-bucket search (forward from
    # seeds, backward from the start; stops when the frontiers' bucket lower
    # bounds cross the best meeting cost) — same optimal cost, ~half the
    # settled nodes vs the early-exit forward pass.  Path TIES may resolve
    # differently than the forward-only walk; total cost is gated equal in
    # tests/test_planner.py.
    bidirectional: bool = True
    # Direction semantics.  False (default) = reference parity: rotation is
    # the UNSIGNED angle between the backward and forward segments at each
    # node (acos, src/path.rs:105-110 — straight ahead reads π, and left vs
    # right is indistinguishable), first rotation fixed at 0.  True = the
    # drivable turn-chain intent: rotation[i] is the SIGNED turn (atan2,
    # positive = toward +x / image right, 0 = straight) from the current
    # heading to hop i's segment, with rotation[0] measured from the robot's
    # initial facing (up the map).  A controller executes the signed list as
    # "turn rotation[i], then advance magnitude[i]" (tod_tpu/sim follows it
    # closed-loop).  Wire format is unchanged — only the angle values differ.
    signed_turns: bool = False


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Temporal ball tracking (tod_tpu/track): a constant-velocity Kalman
    track bank over the fusion ball centroids, fused into the frame+plan
    serving graph.  The reference plans from per-frame detections
    (src/path.rs:37-49 reads Scene.balls rebuilt every frame) — tracking is
    the temporal layer its continuous loop needed.  Units are birdseye grid
    cells; velocities are cells per tracker update (one update per planning
    dispatch).  Off by default: reference parity plans from raw centroids.
    """

    enabled: bool = False
    max_tracks: int = 8
    # association gate: max predicted-position↔measurement distance (cells)
    gate: float = 30.0
    # lifecycle: updates-without-measurement before death; measured updates
    # before a track is confirmed (only confirmed tracks seed the planner)
    max_misses: int = 8
    min_hits: int = 2
    # noise model: white-acceleration process variance (cells²/update²),
    # centroid measurement variance (cells²), newborn velocity variance
    accel_var: float = 1.0
    meas_var: float = 4.0
    vel0_var: float = 25.0
    # measurement validity: minimum centroid pixel count (mirrors the
    # planner's seed gate, PlannerConfig.min_ball_pixels)
    min_pixels: float = 3.0
    # Decaying obstacle memory (the robot-obstacle counterpart of ball
    # coasting): per-dispatch decay factor for an HBM-resident copy of the
    # robot bump layer (geometry.fusion.robot_occupancy).  The planner's
    # height is max(fresh occupancy, decay^k · remembered robot bumps), so a
    # robot whose detection flickers off keeps repelling the path for
    # ~log(err/100)/log(decay) dispatches instead of vanishing for one frame
    # (the reference rebuilds the map from scratch every frame,
    # pt_cloud.comp:108-114 — one missed detection and the planner routes
    # through the robot).  0 disables; 0.8 keeps a vanished bump above the
    # 10-unit terrain scale for ~10 dispatches.  Ego-motion caveat mirrors
    # the track bank's (track/tracker.shift_tracks): the memory lives in the
    # camera-relative birdseye frame and decays within ~1/(1−decay)
    # dispatches, so at serving rates the smear is a few cells.
    obstacle_memory: float = 0.0


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    """TCP control plane (src/path.rs:132-180).

    Defaults keep exact reference wire parity (plaintext, unauthenticated,
    loopback-only — the reference binds 127.0.0.1 and trusts the LAN).  The
    hardening knobs below are for deployments exposed beyond localhost; all
    are opt-in extensions the reference never had:

    - ``auth_token``: when set, a connection must authenticate before any
      command: 7-byte ``b"AuthTok"`` + u32-BE length + token bytes → ``OK``.
      Unauthenticated or wrong-token connections are dropped (and counted).
    - ``tls_cert``/``tls_key``: serve the same protocol over TLS.
    - ``tls_client_ca``: additionally require + verify client certificates
      (mutual TLS) against this CA bundle.
    """

    host: str = "127.0.0.1"
    port: int = 8080
    auth_token: str | None = None
    tls_cert: str | None = None
    tls_key: str | None = None
    tls_client_ca: str | None = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (the reference is inference-only; weights were a
    frozen tflite blob — we own the full training loop)."""

    batch_size: int = 8
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4
    warmup_steps: int = 500
    total_steps: int = 20_000
    # YOLACT loss weights (cls, box, mask, semantic) per the YOLACT paper
    loss_weights: tuple[float, float, float, float] = (1.0, 1.5, 6.125, 1.0)
    cls_loss: str = "ohem"  # "ohem" | "focal"
    # On-device augmentation (train/augment.py:device_augment): hflip +
    # photometric jitter applied inside the jitted train step, keyed on the
    # step counter.  The host-side Augmented wrapper stays available for
    # disk datasets; this one costs the (single-core) host nothing.
    device_augment: bool = False
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level configuration: one object wires the whole frame→path pipeline."""

    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    geometry: GeometryConfig = dataclasses.field(default_factory=GeometryConfig)
    planner: PlannerConfig = dataclasses.field(default_factory=PlannerConfig)
    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    server: ServerConfig = dataclasses.field(default_factory=ServerConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # Legacy tile-parity mode: resize 640×480→448×224 and run two 224×224 tiles
    # (src/yolact.rs:207-217).  Off by default — XLA has no fixed input window,
    # so the idiomatic path is one full-frame pass.
    tile_parity: bool = False

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


def degrees(rad: float) -> float:
    return rad * 180.0 / math.pi


def validate(cfg: PipelineConfig) -> Sequence[str]:
    """Return a list of human-readable config problems (empty = valid)."""
    problems = []
    h, w = cfg.model.input_size
    if h % 8 or w % 8:
        problems.append(f"model.input_size {cfg.model.input_size} not divisible by 8")
    if cfg.model.fpn_levels != len(cfg.model.anchor_scales):
        problems.append("anchor_scales must have one entry per FPN level")
    if cfg.model.meaningful_classes > cfg.model.num_classes:
        problems.append("meaningful_classes exceeds num_classes")
    if cfg.planner.max_seed_balls < 1:
        problems.append("planner.max_seed_balls must be >= 1")
    if cfg.planner.start_offset < 1:
        problems.append("planner.start_offset must be >= 1 (column w-offset)")
    if cfg.model.qat and not cfg.model.quantized:
        problems.append("model.qat requires model.quantized=True")
    if cfg.tracker.enabled:
        if cfg.tracker.max_tracks > cfg.geometry.max_balls:
            problems.append(
                "tracker.max_tracks exceeds geometry.max_balls (the track "
                "seeds are emitted in the ball-slot format)"
            )
        if cfg.tracker.min_hits < 1 or cfg.tracker.max_misses < 0:
            problems.append("tracker.min_hits must be >= 1, max_misses >= 0")
    if not (0.0 <= cfg.tracker.obstacle_memory < 1.0):
        problems.append(
            "tracker.obstacle_memory must be in [0, 1) (a per-dispatch decay)"
        )
    if cfg.tracker.obstacle_memory > 0.0 and not cfg.tracker.enabled:
        problems.append(
            "tracker.obstacle_memory requires tracker.enabled (the memory "
            "lives in the tracked serving graph's HBM state)"
        )
    return problems
