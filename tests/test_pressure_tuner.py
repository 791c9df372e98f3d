"""The truncation-pressure state machine (training/pressure.py).

Scripted boundary sequences pin the four invariants the 20k-iteration TPU
gates discovered the hard way (benchmarks/quality_runs_r3.jsonl):
probe-blind shrink thrash (k 48<->160 at every re-check), floor decay on
quiet windows, and mute backoff for no-change fires. CPU-only, no jax.
"""

from nerf_for_angiography_tpu.training import TrainConfig
from nerf_for_angiography_tpu.training.pressure import PressureTuner, Tuning
from nerf_for_angiography_tpu.training.train import (
    CompactChoice,
    compact_k_for,
    compact_k_lo_for,
)

CFG = TrainConfig(
    compact_samples=96,
    compact_engage_max=192,
    depth_samples_per_ray=300,
    display_every=500,
)

# the flagship drift scenario: the held-out probe measures width 40 while
# the train batch presses 112 samples past k (queue10 logs)
PROBE = CompactChoice(mode="hybrid", width=40, w_cap=160)


def test_sizers_anchor_values():
    # the constants the scenarios below rely on
    assert compact_k_for(40, CFG) == 48
    assert compact_k_for(48 + 112, CFG) == 192  # interim 32-ladder, capped
    assert compact_k_lo_for(24, 88, CFG) == 32


def test_engage_sizes_from_probe():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = tuner.engage(PROBE, CFG)
    assert t == Tuning("hybrid", 48, 160, 0, 0)


def test_fire_grows_by_batch_need_and_floor_stops_the_thrash():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = tuner.engage(PROBE, CFG)

    tuner.observe(50, over=112, over_lo=0, edge=0)
    assert tuner.fire
    t2 = tuner.retune(t, PROBE, CFG)
    assert t2.k == 192  # grown to the batch's measured need
    tuner.resolve(50, changed=(t2 != t), recheck=100)
    assert tuner.fired == 1 and tuner.muted == 0 and not tuner.fire

    # the next cadence re-check still probes width 40 (the r2 behavior
    # shrank right back to 48 here and the batch re-truncated)
    t3 = tuner.retune(t2, PROBE, CFG)
    assert t3.k == 192  # floor holds across probe-blind re-checks


def test_floor_decays_one_bucket_per_quiet_window():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = tuner.engage(PROBE, CFG)
    tuner.observe(50, over=112, over_lo=0, edge=0)
    t = tuner.retune(t, PROBE, CFG)
    tuner.resolve(50, changed=True, recheck=100)
    assert tuner.k_floor == 192

    # quiet display windows: floor descends 32/window, k follows (the
    # shrink hysteresis band does not hold 192 because the probe's 48 is
    # far below k - 32)
    ks = []
    for w in range(1, 7):
        tuner.decay_if_quiet(50 + 500 * w)
        t = tuner.retune(t, PROBE, CFG)
        ks.append(t.k)
    # descends one bucket per window until the 32-wide shrink-hysteresis
    # band around the probe's 48 catches it at 64 (by design: a 64 -> 48
    # shrink would pay a recompile for marginal MLP time)
    assert ks == [160, 128, 96, 64, 64, 64]
    assert tuner.k_floor == 0


def test_pressure_inside_window_blocks_decay():
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor = 160
    tuner.observe(400, over=3, over_lo=0, edge=0)  # pressure seen at 400
    tuner.decay_if_quiet(500)  # 500 - 400 < display_every
    assert tuner.k_floor == 160
    tuner.decay_if_quiet(1000)  # a full quiet window since
    assert tuner.k_floor == 128


def test_no_change_fire_backs_off_exponentially_with_cap():
    # window mode's conservative coarse end can flag edge pressure forever
    # with nothing to grow (w_cap = 0): fires must mute with backoff
    tuner = PressureTuner(display_every=CFG.display_every)
    probe = CompactChoice(mode="window", width=110)
    t = tuner.engage(probe, CFG)
    assert t == Tuning("window", 128, 0, 0, 0)

    tuner.observe(100, over=0, over_lo=0, edge=5)
    t2 = tuner.retune(t, probe, CFG)
    assert t2 == t  # nothing to grow
    tuner.resolve(100, changed=False, recheck=100)
    assert (tuner.muted, tuner.muted_streak) == (1, 1)
    assert tuner.mute_until == 100 + 200

    # pressure during the mute updates the decay gate but does not fire
    tuner.observe(200, over=0, over_lo=0, edge=5)
    assert not tuner.fire and tuner.last_seen == 200

    tuner.observe(350, over=0, over_lo=0, edge=5)
    assert tuner.fire
    tuner.resolve(350, changed=False, recheck=100)
    assert tuner.mute_until == 350 + 400
    tuner.observe(800, over=0, over_lo=0, edge=5)
    tuner.resolve(800, changed=False, recheck=100)
    # streak 3 -> 100 * 8 = 800, capped at display_every = 500
    assert tuner.mute_until == 800 + 500

    # a fire that changes something resets the streak
    tuner.observe(1400, over=40, over_lo=0, edge=0)
    t3 = tuner.retune(t2, probe, CFG)
    assert t3.k == compact_k_for(128 + 40, CFG) == 192
    tuner.resolve(1400, changed=True, recheck=100)
    assert tuner.muted_streak == 0 and tuner.fired == 1


def test_engage_after_revert_keeps_floors():
    # revert-to-dense then re-engage: the batch's measured need survives
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor, tuner.wcap_floor = 160, 176
    t = tuner.engage(PROBE, CFG)
    assert (t.k, t.w_cap) == (160, 176)


def test_shrink_hysteresis_without_floors():
    # small probe shrinks inside the 32 band hold the current size (no
    # recompile thrash); big shrinks pass through
    tuner = PressureTuner(display_every=CFG.display_every)
    t = Tuning("hybrid", 96, 160, 0, 0)
    near = CompactChoice(mode="hybrid", width=70, w_cap=144)  # k2=88, in band
    t2 = tuner.retune(t, near, CFG)
    assert (t2.k, t2.w_cap) == (96, 160)
    far = CompactChoice(mode="hybrid", width=40, w_cap=96)  # k2=48, past band
    t3 = tuner.retune(t, far, CFG)
    assert (t3.k, t3.w_cap) == (48, 96)


def test_mode_switch_skips_hysteresis_and_pressure_growth():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = Tuning("hybrid", 96, 160, 0, 0)
    tuner.observe(50, over=50, over_lo=0, edge=0)
    probe = CompactChoice(mode="window", width=40)
    t2 = tuner.retune(t, probe, CFG)
    # different mode: sized purely from the probe; the batch's pressure
    # numbers were measured against the OLD mode's k and do not transfer
    assert t2 == Tuning("window", 48, 0, 0, 0)
    assert tuner.k_floor == 0


def test_lo_bucket_pressure_grows_and_floors_k_lo():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = Tuning("hybrid", 96, 160, 48, 32)
    probe = CompactChoice(
        mode="hybrid", width=70, w_cap=160, w_lo=48, width_lo=24
    )
    tuner.observe(50, over=0, over_lo=20, edge=0)
    t2 = tuner.retune(t, probe, CFG)
    # k_lo grows to fit the lo bucket's measured need (32 + 20 -> 64)
    assert t2.k_lo == compact_k_lo_for(32 + 20, t2.k, CFG) == 64
    assert tuner.klo_floor == 64
    tuner.resolve(50, changed=True, recheck=100)

    # the probe-blind re-check (width_lo 24 -> k_lo 32) cannot shrink past
    # the floor
    t3 = tuner.retune(t2, probe, CFG)
    assert t3.k_lo == 64


def test_k_lo_collapses_to_single_k_when_it_reaches_k():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = Tuning("hybrid", 48, 160, 48, 32)
    probe = CompactChoice(
        mode="hybrid", width=40, w_cap=160, w_lo=48, width_lo=24
    )
    tuner.observe(50, over=0, over_lo=40, edge=0)
    t2 = tuner.retune(t, probe, CFG)
    # k_lo would reach k -> the split buys nothing -> single-k fallback
    assert t2.k_lo == 0


def test_collapsed_split_is_banned_until_quiet():
    """The r3q12_h2k_s0 thrash: pressure collapses k_lo (lo-bucket need
    reached k), the next probe-blind check re-proposed k_lo from the
    probe's small width_lo, the batch truncated again — a 40<->0 flip at
    EVERY check for a whole 20k run. A collapse must ban the split until
    a quiet display window."""
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor = 160  # as in the real run: the batch pressed k to 160
    t = Tuning("hybrid", 160, 208, 112, 40)
    probe = CompactChoice(
        mode="hybrid", width=39, w_cap=160, w_lo=112, width_lo=33
    )
    # batch lo-bucket presses its need past k (40 + 130 -> >= 160)
    tuner.observe(2800, over=0, over_lo=130, edge=0)
    t2 = tuner.retune(t, probe, CFG)
    assert t2.k_lo == 0 and tuner.klo_banned
    tuner.resolve(2800, changed=True, recheck=100)

    # the next probe-blind checks must NOT re-enable the split
    t3 = tuner.retune(t2, probe, CFG)
    assert t3.k_lo == 0

    # pressure keeps the window non-quiet -> ban holds through display
    tuner.observe(3000, over=1, over_lo=0, edge=0)
    tuner.decay_if_quiet(3300)
    assert tuner.klo_banned
    # a genuinely quiet display window lifts the ban; the split may retry
    tuner.decay_if_quiet(3800)
    assert not tuner.klo_banned
    t4 = tuner.retune(t3, probe, CFG)
    assert t4.k_lo == 40


def test_floored_k_is_the_reference_for_k_lo_decisions():
    """The r3q12_h2k_s1 thrash: with k floored at 128 (probe says 48),
    comparing k_lo against the PRE-floor probe k collapsed the split
    (48 >= 48) on exactly the checks where hysteresis had a k_lo to
    compare, and re-enabled it on the others — a 48<->0 flip at every
    check. The engaged state must be a FIXED POINT of a probe-blind
    retune."""
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor, tuner.klo_floor = 128, 48
    t = Tuning("hybrid", 128, 192, 112, 48)
    probe = CompactChoice(
        mode="hybrid", width=39, w_cap=192, w_lo=112, width_lo=33
    )
    assert tuner.retune(t, probe, CFG) == t
    # and twice (the alternation had period 2)
    assert tuner.retune(tuner.retune(t, probe, CFG), probe, CFG) == t
    assert not tuner.klo_banned


def test_decay_bounce_doubles_the_quiet_period():
    """Invariant 5 (the r3 session-9 diagnosis): decay_if_quiet drops
    k_floor one bucket every quiet window, the very next pressure fire
    regrows it — 8 such bounce cycles per 20k run, ~100 truncating iters
    each. A bounced decay must double the quiet period the next decay
    requires; a decay that sticks resets the backoff."""
    tuner = PressureTuner(display_every=CFG.display_every)
    t = tuner.engage(PROBE, CFG)
    tuner.observe(50, over=112, over_lo=0, edge=0)
    t = tuner.retune(t, PROBE, CFG)
    tuner.resolve(50, changed=True, recheck=100)
    assert tuner.k_floor == 192

    # quiet window -> decay fires (streak 0)
    tuner.decay_if_quiet(550)
    assert tuner.k_floor == 160 and tuner.last_decay == 550

    # the batch regrows the floor within the same display window: BOUNCE
    tuner.observe(600, over=40, over_lo=0, edge=0)
    t = tuner.retune(t, PROBE, CFG)
    tuner.resolve(600, changed=True, recheck=100)
    assert tuner.k_floor == 192
    assert tuner.decay_streak == 1 and tuner.decay_bounces == 1

    # one quiet window is no longer enough...
    tuner.decay_if_quiet(1100)
    assert tuner.k_floor == 192
    # ...two are (600 + 2*500 = 1600)
    tuner.decay_if_quiet(1600)
    assert tuner.k_floor == 160

    # second bounce doubles again
    tuner.observe(1650, over=40, over_lo=0, edge=0)
    t = tuner.retune(t, PROBE, CFG)
    tuner.resolve(1650, changed=True, recheck=100)
    assert tuner.decay_streak == 2 and tuner.decay_bounces == 2
    tuner.decay_if_quiet(2650)  # 1000 quiet < 2000 required
    assert tuner.k_floor == 192
    tuner.decay_if_quiet(3650)  # 2000 quiet
    assert tuner.k_floor == 160


def test_decay_that_sticks_resets_the_backoff():
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor = 192
    tuner.decay_streak = 2
    tuner.last_seen = 50
    # streak 2 -> needs 2000 quiet; decay at 2100
    tuner.decay_if_quiet(2100)
    assert tuner.k_floor == 160 and tuner.last_decay == 2100
    # a full display window passes with no bounce: the next display
    # boundary drops the backoff and decays again immediately
    tuner.decay_if_quiet(2600)
    assert tuner.decay_streak == 0
    assert tuner.k_floor == 128


def test_bounce_counted_once_per_decay():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = tuner.engage(PROBE, CFG)
    tuner.observe(50, over=112, over_lo=0, edge=0)
    t = tuner.retune(t, PROBE, CFG)
    tuner.resolve(50, changed=True, recheck=100)
    tuner.decay_if_quiet(550)

    # two regrow fires inside the same window: ONE bounce
    for m in (600, 700):
        tuner.observe(m, over=40, over_lo=0, edge=0)
        t = tuner.retune(t, PROBE, CFG)
        tuner.resolve(m, changed=True, recheck=100)
    assert tuner.decay_bounces == 1 and tuner.decay_streak == 1


def test_fresh_growth_with_no_prior_floor_is_not_a_bounce():
    """A no-op decay (all floors already zero) must not arm bounce
    detection: the first pressure fire of a run is growth, not a bounce."""
    tuner = PressureTuner(display_every=CFG.display_every)
    t = tuner.engage(PROBE, CFG)
    tuner.decay_if_quiet(500)  # nothing to shed
    tuner.observe(550, over=112, over_lo=0, edge=0)
    t = tuner.retune(t, PROBE, CFG)
    tuner.resolve(550, changed=True, recheck=100)
    assert tuner.decay_bounces == 0 and tuner.decay_streak == 0


def test_ban_lift_then_recollapse_is_a_bounce():
    """The split-collapse analogue: a quiet window lifts klo_banned, the
    split re-enables, the batch collapses it again within the window —
    that oscillation must also back off the decay cadence."""
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor = 160
    tuner.klo_banned = True
    tuner.last_seen = 50
    tuner.decay_if_quiet(600)
    assert not tuner.klo_banned and tuner.last_decay == 600

    # the re-enabled split immediately collapses again under lo pressure
    t = Tuning("hybrid", 160, 208, 112, 40)
    probe = CompactChoice(
        mode="hybrid", width=39, w_cap=160, w_lo=112, width_lo=33
    )
    tuner.observe(700, over=0, over_lo=130, edge=0)
    t2 = tuner.retune(t, probe, CFG)
    assert t2.k_lo == 0 and tuner.klo_banned
    tuner.resolve(700, changed=True, recheck=100)
    assert tuner.decay_bounces == 1 and tuner.decay_streak == 1
    # the ban now holds for TWO quiet windows, not one
    tuner.decay_if_quiet(1300)
    assert tuner.klo_banned
    tuner.decay_if_quiet(1800)
    assert not tuner.klo_banned


def test_evidence_gate_blocks_decay_the_batch_still_needs():
    """Invariant 5b: the batch's observed max active count (march ac)
    holds a floor up through quiet windows — a decay below what the batch
    measurably used would bounce by construction. The r4q1 conf_s1 run
    still paid 3 bounce cycles under the pure backoff because overflow
    pressure has a low duty cycle (quiet windows with a loaded batch)."""
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor = 160
    # quiet chunks (no overflow) but the batch USES ~155 of k=160
    tuner.observe(100, over=0, over_lo=0, edge=0, ac=155)
    tuner.observe(150, over=0, over_lo=0, edge=0, ac=140)
    tuner.decay_if_quiet(500)
    assert tuner.k_floor == 160  # 155 > 160-32: decay refused
    assert tuner.last_decay < 0  # nothing shed -> bounce detection unarmed

    # the batch's need genuinely drops (grid pruned): decay resumes.
    # evidence memory is two windows, so the stale 155 gates one more
    # boundary, then the floor sheds.
    tuner.observe(600, over=0, over_lo=0, edge=0, ac=90)
    tuner.decay_if_quiet(1000)
    assert tuner.k_floor == 160  # prev window still remembers 155
    tuner.observe(1100, over=0, over_lo=0, edge=0, ac=90)
    tuner.decay_if_quiet(1500)
    assert tuner.k_floor == 128  # evidence 90 <= 160-32


def test_evidence_gate_is_per_floor():
    tuner = PressureTuner(display_every=CFG.display_every)
    tuner.k_floor, tuner.klo_floor, tuner.wcap_floor = 160, 64, 176
    # hi bucket loaded, lo bucket slack
    tuner.observe(100, over=0, over_lo=0, edge=0, ac=150, ac_lo=20)
    tuner.decay_if_quiet(500)
    assert tuner.k_floor == 160  # gated by ac=150
    assert tuner.klo_floor == 32  # 20 <= 64-32: sheds
    assert tuner.wcap_floor == 160  # no width evidence: ungated ladder


def test_edge_pressure_grows_w_cap_by_one_bucket():
    tuner = PressureTuner(display_every=CFG.display_every)
    t = Tuning("hybrid", 96, 160, 0, 0)
    probe = CompactChoice(mode="hybrid", width=70, w_cap=160)
    tuner.observe(50, over=0, over_lo=0, edge=3)
    t2 = tuner.retune(t, probe, CFG)
    assert t2.w_cap == 176
    assert tuner.wcap_floor == 176
    tuner.resolve(50, changed=True, recheck=100)
    t3 = tuner.retune(t2, probe, CFG)
    assert t3.w_cap == 176  # floor holds across re-checks
