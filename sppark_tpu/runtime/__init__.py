"""Device runtime layer (util/ analogue).

Maps the reference's GPU runtime vocabulary onto JAX's device model:

  * gpus_t::all()/ngpus()/select_gpu() (util/all_gpus.cpp:11-87)
      -> all_devices()/ndevices()/select_device()
  * gpu_ptr_t<T> refcounted device allocation handed across FFI
      (util/gpu_t.cuh:269-318) -> DevPtr (jax arrays already refcount;
      DevPtr adds the clone/drop FFI contract and device pinning)
  * cuda_timer_t (util/cuda_timer_t.cuh:12-69) -> DeviceTimer
  * stream flip-flop pipelining (gpu_t.cuh:173-267) -> XLA async dispatch:
      jax ops are asynchronous by default; `Staging` provides the explicit
      double-buffered host->device overlap used by larger-than-HBM batches.
"""

from .devices import all_devices, ndevices, select_device, device_props, \
    accelerator_available
from .dev_ptr import DevPtr
from .timer import DeviceTimer

__all__ = ["all_devices", "ndevices", "select_device", "device_props",
           "accelerator_available", "DevPtr", "DeviceTimer"]
