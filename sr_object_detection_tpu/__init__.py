"""sr_object_detection_tpu — TPU-native rebuild of the Darknet/YOLOv2
robot-vision framework (reference: NidhiMishra/SR_object_detection).

A from-scratch JAX/XLA/Pallas implementation: cfg files compile to pure
jitted programs, ``.weights`` files load bit-compatibly, and detection /
classification / recurrent model families run as fused TPU graphs.
"""

__version__ = "0.1.0"

from .graph.spec import parse_network_cfg, NetworkSpec  # noqa: F401
from .graph.compiler import CompiledNetwork, build_forward  # noqa: F401
from .io.weights import load_weights, save_weights, init_params  # noqa: F401
