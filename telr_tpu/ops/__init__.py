from telr_tpu.ops.intervals import Intervals, merge_intervals, intersect_wao, closest
