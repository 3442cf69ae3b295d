from rayaccel_tpu.scene.data import SceneData
from rayaccel_tpu.scene.compile import TpuScene, create_scene, compile_scene

__all__ = ["SceneData", "TpuScene", "create_scene", "compile_scene"]
