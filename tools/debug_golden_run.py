import numpy as np, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from plade_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from plade_tpu.core.config import PladeConfig
from plade_tpu.pipeline import register_files
GT = np.array([
    [-0.50608, 0.86067, 0.05595, -0.25258],
    [0.82135, 0.50072, -0.27326, 0.86333],
    [-0.26320, -0.09234, -0.96031, 0.15475],
    [0.0, 0.0, 0.0, 1.0]])
t0=time.time()
T, info = register_files(
    "/root/reference/sample_data/polyhedron_target.ply",
    "/root/reference/sample_data/polyhedron_source.ply",
    PladeConfig(), seed=0)
print("wall:", time.time()-t0)
print(info)
print(T)
c = (np.trace(GT[:3,:3].T @ T[:3,:3]) - 1.0)/2.0
print("rot_err_deg", np.degrees(np.arccos(np.clip(c,-1,1))), "trans_err", np.linalg.norm(T[:3,3]-GT[:3,3]))
