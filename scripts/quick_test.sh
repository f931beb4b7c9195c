#!/bin/bash
# Smoke matrix over models x integrators via the CLI — the reference's
# tests/integration/quick_test.sh equivalent. Runs tiny configs; any
# non-zero exit is a failure. Use JAX_PLATFORMS/config to pick the backend.
set -u
cd "$(dirname "$0")/.."
TMP=$(mktemp -d)
fails=0

run_config () {
    name=$1
    shift
    printf '%s' "$*" > "$TMP/$name.ini"
    if python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from wxfactory_tpu.__main__ import main
import sys; sys.exit(main(['$TMP/$name.ini']))
" > "$TMP/$name.log" 2>&1; then
        echo "PASS $name"
    else
        echo "FAIL $name (see $TMP/$name.log)"
        fails=$((fails+1))
    fi
}

sw_base () {
    echo "[General]
equations = shallow_water
[Grid]
grid_type = cubed_sphere
[Test_case]
case_number = 6
[Time_integration]
t_end = 3600
dt = 1800
tolerance = 1e-7
time_integrator = $1
[Spatial_discretization]
num_solpts = 3
num_elements_horizontal = 4
[Output_options]
output_dir = $TMP/out
"
}

for integ in tvdrk3 epi2 epi3 srerk3 ros2 crank_nicolson bdf2; do
    run_config "sw_$integ" "$(sw_base $integ)"
done

run_config "euler3d_epi2" "[General]
equations = euler
[Grid]
grid_type = cubed_sphere
ztop = 10000.0
[Test_case]
case_number = 31
[Time_integration]
dt = 30
t_end = 60
time_integrator = epi2
exponential_solver = kiops
[Spatial_discretization]
num_solpts = 2
num_elements_horizontal = 4
num_elements_vertical = 2
[Output_options]
output_dir = $TMP/out
"

run_config "bubble_tvdrk3" "[General]
equations = euler
[Grid]
grid_type = cartesian2d
x0 = 0
x1 = 1000
z0 = 0
z1 = 1500
[Test_case]
case_number = 2
[Time_integration]
dt = 0.02
t_end = 0.2
time_integrator = tvdrk3
[Spatial_discretization]
num_solpts = 4
num_elements_horizontal = 10
num_elements_vertical = 15
[Output_options]
output_dir = $TMP/out
"

echo "-----"
echo "$fails failures"
exit $fails
