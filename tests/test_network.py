"""GRUPNET/NETBALAN network balancing (wells/network.py).

Reference analog: the standard network model — group node pressures from
branch VFP tables act as THP constraints on member wells (SURVEY.md §2.5
group layer)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

PSI = 6894.757

VFP_TEXT = """VFPPROD
 1 8400 'OIL' 'WOR' 'GOR' 'THP' ' ' 'FIELD' 'BHP' /
 1000 5000 10000 /
 200 2000 /
 0.0 1.0 /
 1.0 5.0 /
 0.0 /
 1 1 1 1 1500 1800 2100 /
 1 1 2 1 1200 1400 1600 /
 1 2 1 1 1700 2000 2300 /
 1 2 2 1 1400 1600 1800 /
 2 1 1 1 4750 4750 4750 /
 2 1 2 1 4750 4750 4750 /
 2 2 1 1 4750 4750 4750 /
 2 2 2 1 4750 4750 4750 /
/
"""


def _network_deck(tmp_path, field_pressure="2000", branch_vfp=0):
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(8, 8, 3, tstep_days="2 5 10 20")
    sched = f"""SCHEDULE
{VFP_TEXT}
GRUPTREE
 'PLAT' 'FIELD' /
/
GRUPNET
 'FIELD' {field_pressure} /
 'PLAT' 1* {branch_vfp} /
/
NETBALAN
 0 0.1 12 /
WELSPECS
 'PROD'  'PLAT' 8 8 8400 'OIL' /
 'INJ'   'G1'   1 1 8335 'GAS' /
/
COMPDAT
 'PROD'  8 8 3 3 'OPEN' 1* 1* 0.5 /
 'INJ'   1 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONPROD
 'PROD' 'OPEN' 'ORAT' 10000 4* 1000 1* 1 /
/
WCONINJE
 'INJ' 'GAS' 'OPEN' 'RATE' 20000 1* 9014 /
/
TSTEP
 2 5 10 20 /
END
"""
    head = text.split("SCHEDULE")[0]
    p = tmp_path / "NET.DATA"
    p.write_text(head + sched)
    return str(p)


def test_parse_grupnet(tmp_path):
    state = load_state(_network_deck(tmp_path))
    net = state.schedule.steps[0].groups["net"]
    assert net["FIELD"]["pressure"] == pytest.approx(2000 * PSI, rel=1e-4)
    assert net["PLAT"]["pressure"] is None
    assert net["PLAT"]["vfp"] == 0
    assert net["_balan"]["max_iter"] == 12


def test_node_pressures_inherit_and_branch(tmp_path):
    from opm_autodiff_tpu.io.deck import read_deck
    from opm_autodiff_tpu.wells.network import node_pressures
    from opm_autodiff_tpu.wells.vfp import VfpBank, parse_vfpprod

    p = tmp_path / "VFP.DATA"
    p.write_text("SCHEDULE\n" + VFP_TEXT + "END\n")
    table = parse_vfpprod(read_deck(str(p)).get1("VFPPROD").records, U.FIELD)
    bank = VfpBank.from_tables([table])

    tree = {"PLAT": "FIELD", "SAT": "PLAT"}
    net = {"FIELD": {"pressure": 400 * PSI, "vfp": 0, "alq": 0.0},
           "PLAT": {"pressure": None, "vfp": 1, "alq": 0.0},
           "SAT": {"pressure": None, "vfp": 0, "alq": 0.0}}
    lr = U.FIELD.liquid_rate
    rates = {"PLAT": np.array([0.0, 5000 * lr, 5000 * U.FIELD.gas_rate]),
             "SAT": np.array([0.0, 1000 * lr, 1000 * U.FIELD.gas_rate])}
    press = node_pressures(tree, net, rates, bank, {1: 0})
    assert press["FIELD"] == pytest.approx(400 * PSI)
    # PLAT sits upstream of a pipeline branch: strictly higher pressure
    assert press["PLAT"] > press["FIELD"]
    # the branch table's BHP range bounds the node pressure
    assert 1200 * PSI < press["PLAT"] < 4750 * PSI
    # SAT has no branch table: inherits its parent node pressure
    assert press["SAT"] == pytest.approx(press["PLAT"])


def test_network_constrains_well(tmp_path):
    """The FIELD node pressure (2000 psia) maps through the well's VFP
    table to a ~4750 psia BHP floor — unreachable at the 10000 stb/d
    target, so the well must switch to THP control and produce less."""
    deck = _network_deck(tmp_path)
    sim = Simulator(load_state(deck), SimulatorOptions())
    sim.run()
    press = sim._net_pressures
    assert press["PLAT"] == pytest.approx(2000 * PSI, rel=1e-6)
    rows = sim.summary.rows
    # the ORAT target is never met once the network THP limit binds
    assert rows[-1]["WOPR:PROD"] < 9000
    # and the well ends on THP control
    from opm_autodiff_tpu.wells.standard import CTRL_THP
    i_prod = sim._std_well_names.index("PROD")
    assert int(np.asarray(sim.active_mode)[i_prod]) == CTRL_THP
