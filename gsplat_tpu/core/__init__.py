from gsplat_tpu.core import sh, transforms, schedules
