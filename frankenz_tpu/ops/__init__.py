"""Numerical kernels: likelihoods, KDE, transforms, summaries.

TPU-native rebuild of the reference's `frankenz/pdf.py` layer (L3 in
SURVEY.md) plus the Pallas fast paths the reference has no counterpart for.
"""

from .likelihood import (  # noqa: F401
    LoglikeResult,
    LogprobResult,
    clean_data,
    loglike,
    loglike_fixed,
    loglike_free,
    logprob,
)
from .kde import (  # noqa: F401
    PDFDict,
    gauss_kde,
    gauss_kde_dict,
    gaussian,
    gaussian_bin,
    kde_stack,
    kde_stack_gathered,
    kde_stack_gathered_dict,
    kernel_matrix,
    kernel_matrix_dict,
    resolve_kde_opts,
    threshold_weights,
)
from .transforms import (  # noqa: F401
    inv_luptitude,
    inv_magnitude,
    luptitude,
    magnitude,
)
from .summarize import (  # noqa: F401
    PDFSummary,
    PointEstimate,
    loss_kernel_matrix,
    pdfs_resample,
    pdfs_summarize,
    unpack_summary,
)
