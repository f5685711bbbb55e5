from gsplat_tpu.models.gaussian_model import GaussianParams, create_from_pcd, pad_to_capacity
