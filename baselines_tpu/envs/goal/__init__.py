from baselines_tpu.envs.goal.point_reach import PointReach

__all__ = ["PointReach"]
