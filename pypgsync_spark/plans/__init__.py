from pypgsync_spark.plans.intervals import closed_intervals, plan_slices, SlicePlan

__all__ = ["closed_intervals", "plan_slices", "SlicePlan"]
