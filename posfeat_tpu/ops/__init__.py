"""Numeric op library — the kernel surface of the framework.

TPU-first equivalents of the reference op library
(/root/reference/losses/preprocess_utils.py). All ops are functional,
jit-friendly (static shapes, explicit PRNG keys) and operate on NHWC
feature maps.
"""

from .coords import (
    homogenize,
    normalize_coords,
    denormalize_coords,
    gen_grid,
)
from .grid_sample import grid_sample, sample_feat_by_coord
from .correlation import (
    compute_prob,
    get_expected_correspondence_locs,
    ot_sinkhorn_log,
    ot_sinkhorn_log_unmatch,
    dual_softmax,
)
from .nms import nms, soft_nms
from .priors import ssim_prior, d2_prior, asl_peak_prior, identity_prior
from .epipolar import (
    epipolar_cost,
    get_endpoints,
    valid_points,
    epipolar_line_search,
    get_expected_correspondence_within_window,
)
from .samplers import (
    unfold,
    grid_categorical_sample,
    grid_bernoulli_accept,
    generate_kpts_regular_grid_random,
    gumbel_topk_select,
)
from .detect import (
    generate_kpts_single,
    generate_kpts_single_noavg,
    generate_kpts_regular_grid_single,
)
from .matchers import (
    mnn_matcher,
    mutual_nn_matcher,
    ratio_matcher,
    mutual_nn_ratio_matcher,
)
