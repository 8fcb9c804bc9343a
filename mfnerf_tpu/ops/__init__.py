from .morton import morton3d, morton3d_invert, packbits
from .intersection import ray_aabb_intersect, ray_sphere_intersect
from .stepping import calc_dt, mip_from_pos, mip_from_dt, t_ladder, max_ladder_steps
from .sh import sh_encode
from .activations import trunc_exp

__all__ = [
    "morton3d", "morton3d_invert", "packbits",
    "ray_aabb_intersect", "ray_sphere_intersect",
    "calc_dt", "mip_from_pos", "mip_from_dt", "t_ladder", "max_ladder_steps",
    "sh_encode", "trunc_exp",
]
