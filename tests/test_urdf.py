"""URDF loader tests: parse a synthetic URDF and (when available) the
reference go1.urdf, and compare against the baked go1() constants."""
import os

import numpy as np
import pytest

from walk_these_ways_tpu.models import robot as robot_mod
from walk_these_ways_tpu.models import urdf

REF_URDF = "/root/reference/resources/robots/go1/urdf/go1.urdf"


@pytest.mark.skipif(not os.path.exists(REF_URDF), reason="reference URDF absent")
def test_go1_urdf_matches_baked_model():
    m = urdf.load(REF_URDF)
    g = robot_mod.go1()
    assert m.nb == g.nb and m.nj == g.nj
    assert m.joint_names == g.joint_names
    assert m.num_report_bodies == g.num_report_bodies
    np.testing.assert_array_equal(m.feet_report_indices, g.feet_report_indices)
    np.testing.assert_allclose(m.mass, g.mass, atol=1e-9)
    np.testing.assert_allclose(m.com, g.com, atol=1e-9)
    np.testing.assert_allclose(m.inertia, g.inertia, atol=1e-9)
    np.testing.assert_allclose(m.joint_anchor, g.joint_anchor, atol=1e-12)
    np.testing.assert_allclose(m.joint_axis, g.joint_axis, atol=1e-12)
    np.testing.assert_allclose(m.dof_lower, g.dof_lower, atol=1e-12)
    np.testing.assert_allclose(m.dof_effort, g.dof_effort, atol=1e-12)
    np.testing.assert_array_equal(m.crba_conn, g.crba_conn)


def test_synthetic_two_link(tmp_path):
    p = tmp_path / "robot.urdf"
    p.write_text("""<?xml version="1.0"?>
<robot name="pendulum">
  <link name="world_base">
    <inertial><mass value="1.0"/><origin xyz="0 0 0"/>
      <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.1" iyz="0" izz="0.1"/></inertial>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 -0.1"/><parent link="world_base"/><child link="arm"/>
    <axis xyz="0 1 0"/>
    <limit effort="10" lower="-1" upper="1" velocity="5"/>
  </joint>
  <link name="arm">
    <inertial><mass value="0.5"/><origin xyz="0 0 -0.2"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.001"/></inertial>
    <collision><origin xyz="0 0 -0.4"/><geometry><sphere radius="0.03"/></geometry></collision>
  </link>
</robot>""")
    m = urdf.load(str(p))
    assert m.nb == 2 and m.nj == 1
    assert m.mass[0] == 1.0 and m.mass[1] == 0.5
    np.testing.assert_allclose(m.joint_anchor[0], [0, 0, -0.1])
    assert m.cp_radius[-1] == 0.03
