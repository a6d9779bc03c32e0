"""Runtime layer (util/ analogue) behavior tests."""

import pytest

import jax.numpy as jnp

from sppark_tpu.runtime import (all_devices, ndevices, select_device,
                                device_props, DevPtr, DeviceTimer)


def test_device_enumeration():
    assert ndevices() == 8                  # virtual CPU mesh from conftest
    assert len(all_devices()) == 8
    props = device_props(0)
    assert props["platform"] == "cpu"


def test_select_device():
    d1 = select_device(1)
    assert select_device(-1) is d1          # -1 returns current selection
    with pytest.raises(IndexError):
        select_device(99)
    select_device(0)


def test_dev_ptr_lifecycle():
    ptr = DevPtr(jnp.arange(8))
    h = ptr.handle
    assert DevPtr.from_handle(h) is ptr
    ptr.clone()                             # refs = 2
    ptr.drop()                              # refs = 1, still alive
    assert DevPtr.from_handle(h) is ptr
    ptr.drop()                              # refs = 0, dropped
    with pytest.raises(KeyError):
        DevPtr.from_handle(h)


def test_device_timer():
    t = DeviceTimer().start()
    x = jnp.arange(1024).sum()
    ms = t.stop(fence=x)
    assert ms >= 0.0 and "ms" in repr(t)
