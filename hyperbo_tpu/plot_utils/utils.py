"""Alias of hyperbo_tpu.analysis.plots."""
from hyperbo_tpu.analysis.plots import (  # noqa: F401
    plot_all, plot_array_mean_std, plot_array_median_percentile,
    plot_summary, plot_with_upper_lower, set_violin_axis_style)
