"""Robot model zoo — freshly authored test/benchmark scenes.

Plays the role of the reference's URDF/SRDF fixtures
(trajopt_common/data/: spherebot, boxbot, PR2 arm scenes — SURVEY.md §4
"Fixtures").  These are NOT copies: they are minimal scenes with the same
*semantics* (a 2-DoF planar sphere robot vs a sphere obstacle, a 2-DoF
planar box robot for swept-collision tests, and a 7-DoF capsule arm standing
in for the PR2/iiwa-class arm used by the planning and glass-upright
benchmarks).
"""

from __future__ import annotations

from ..kinematics.urdf import parse_urdf, RobotModel
from ..kinematics.chain import build_chain, Chain

SPHEREBOT_URDF = """
<robot name="spherebot">
  <link name="world"/>
  <link name="slide_x"/>
  <link name="ball">
    <collision><geometry><sphere radius="0.5"/></geometry></collision>
  </link>
  <link name="obstacle">
    <collision><geometry><sphere radius="0.5"/></geometry></collision>
  </link>
  <joint name="x" type="prismatic">
    <parent link="world"/><child link="slide_x"/>
    <axis xyz="1 0 0"/><limit lower="-20" upper="20" velocity="2"/>
  </joint>
  <joint name="y" type="prismatic">
    <parent link="slide_x"/><child link="ball"/>
    <axis xyz="0 1 0"/><limit lower="-20" upper="20" velocity="2"/>
  </joint>
  <joint name="obstacle_fix" type="fixed">
    <origin xyz="0 0 0"/>
    <parent link="world"/><child link="obstacle"/>
  </joint>
</robot>
"""

BOXBOT_URDF = """
<robot name="boxbot">
  <link name="world"/>
  <link name="slide_x"/>
  <link name="box">
    <collision><geometry><box size="1 1 1"/></geometry></collision>
  </link>
  <link name="obstacle">
    <collision><geometry><box size="1 1 1"/></geometry></collision>
  </link>
  <joint name="x" type="prismatic">
    <parent link="world"/><child link="slide_x"/>
    <axis xyz="1 0 0"/><limit lower="-20" upper="20" velocity="2"/>
  </joint>
  <joint name="y" type="prismatic">
    <parent link="slide_x"/><child link="box"/>
    <axis xyz="0 1 0"/><limit lower="-20" upper="20" velocity="2"/>
  </joint>
  <joint name="obstacle_fix" type="fixed">
    <origin xyz="0 0 0"/>
    <parent link="world"/><child link="obstacle"/>
  </joint>
</robot>
"""

# A 7-DoF serial arm with alternating Z/Y revolute axes and capsule collision
# geometry (iiwa-like proportions) — the "glass-upright-class 7-DoF" flagship
# from BASELINE.json.  A table obstacle is a fixed box link.
ARM7_URDF = """
<robot name="arm7">
  <link name="base">
    <collision><origin xyz="0 0 0.075"/>
      <geometry><cylinder radius="0.10" length="0.15"/></geometry></collision>
  </link>
  <link name="l1">
    <collision><origin xyz="0 0 0.1"/>
      <geometry><capsule radius="0.08" length="0.20"/></geometry></collision>
  </link>
  <link name="l2">
    <collision><origin xyz="0 0 0.105"/>
      <geometry><capsule radius="0.07" length="0.21"/></geometry></collision>
  </link>
  <link name="l3">
    <collision><origin xyz="0 0 0.1"/>
      <geometry><capsule radius="0.07" length="0.20"/></geometry></collision>
  </link>
  <link name="l4">
    <collision><origin xyz="0 0 0.095"/>
      <geometry><capsule radius="0.06" length="0.19"/></geometry></collision>
  </link>
  <link name="l5">
    <collision><origin xyz="0 0 0.1"/>
      <geometry><capsule radius="0.06" length="0.20"/></geometry></collision>
  </link>
  <link name="l6">
    <collision><origin xyz="0 0 0.06"/>
      <geometry><capsule radius="0.05" length="0.12"/></geometry></collision>
  </link>
  <link name="l7">
    <collision><origin xyz="0 0 0.04"/>
      <geometry><sphere radius="0.05"/></geometry></collision>
  </link>
  <link name="tool"/>
  <link name="table">
    <collision><geometry><box size="0.8 1.2 0.06"/></geometry></collision>
  </link>

  <joint name="j1" type="revolute">
    <origin xyz="0 0 0.15"/><parent link="base"/><child link="l1"/>
    <axis xyz="0 0 1"/><limit lower="-2.96" upper="2.96" velocity="1.7"/>
  </joint>
  <joint name="j2" type="revolute">
    <origin xyz="0 0 0.20"/><parent link="l1"/><child link="l2"/>
    <axis xyz="0 1 0"/><limit lower="-2.09" upper="2.09" velocity="1.7"/>
  </joint>
  <joint name="j3" type="revolute">
    <origin xyz="0 0 0.21"/><parent link="l2"/><child link="l3"/>
    <axis xyz="0 0 1"/><limit lower="-2.96" upper="2.96" velocity="1.7"/>
  </joint>
  <joint name="j4" type="revolute">
    <origin xyz="0 0 0.20"/><parent link="l3"/><child link="l4"/>
    <axis xyz="0 1 0"/><limit lower="-2.09" upper="2.09" velocity="2.2"/>
  </joint>
  <joint name="j5" type="revolute">
    <origin xyz="0 0 0.19"/><parent link="l4"/><child link="l5"/>
    <axis xyz="0 0 1"/><limit lower="-2.96" upper="2.96" velocity="2.4"/>
  </joint>
  <joint name="j6" type="revolute">
    <origin xyz="0 0 0.20"/><parent link="l5"/><child link="l6"/>
    <axis xyz="0 1 0"/><limit lower="-2.09" upper="2.09" velocity="3.1"/>
  </joint>
  <joint name="j7" type="revolute">
    <origin xyz="0 0 0.126"/><parent link="l6"/><child link="l7"/>
    <axis xyz="0 0 1"/><limit lower="-3.05" upper="3.05" velocity="3.1"/>
  </joint>
  <joint name="tool_fix" type="fixed">
    <origin xyz="0 0 0.08"/><parent link="l7"/><child link="tool"/>
  </joint>
  <joint name="table_fix" type="fixed">
    <origin xyz="0.75 0 0.30"/><parent link="base"/><child link="table"/>
  </joint>
</robot>
"""


def spherebot() -> tuple[RobotModel, Chain]:
    m = parse_urdf(SPHEREBOT_URDF)
    return m, build_chain(m, ["x", "y"])


def boxbot() -> tuple[RobotModel, Chain]:
    m = parse_urdf(BOXBOT_URDF)
    return m, build_chain(m, ["x", "y"])


def arm7() -> tuple[RobotModel, Chain]:
    m = parse_urdf(ARM7_URDF)
    return m, build_chain(m, [f"j{i}" for i in range(1, 8)])
