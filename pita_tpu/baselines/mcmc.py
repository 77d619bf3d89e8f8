"""Ground-truth MCMC samplers (jitted MALA / HMC chains).

Capability parity with the reference's offline data generators
(``sampling/sample_lj13.py`` / ``sample_lj55.py`` — Pyro adaptive-MALA/NUTS at
a given temperature) and fab's HMC/Metropolis transition operators
(``fab/fab/sampling_methods/transition_operators/hmc.py``). Rebuilt as single
``lax.scan`` programs: hundreds of chains vmapped on-device, adaptive step
size targeting a fixed acceptance rate — no per-step host sync.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _mala_step(log_prob_and_force, x, lp, force, dt, key):
    """One MALA step over a batch of chains. Returns accepted state."""
    k_noise, k_accept = jax.random.split(key)
    noise = jax.random.normal(k_noise, x.shape)
    prop = x + 0.5 * dt * force + jnp.sqrt(dt) * noise
    lp_prop, force_prop = log_prob_and_force(prop)
    # forward/backward Gaussian proposal log-densities (sde_integration.py:28-45)
    fwd_mean = x + 0.5 * dt * force
    bwd_mean = prop + 0.5 * dt * force_prop
    log_q_fwd = -jnp.sum((prop - fwd_mean) ** 2, axis=-1) / (2 * dt)
    log_q_bwd = -jnp.sum((x - bwd_mean) ** 2, axis=-1) / (2 * dt)
    log_ratio = (lp_prop - lp) + (log_q_bwd - log_q_fwd)
    accept = jnp.log(jax.random.uniform(k_accept, lp.shape)) < log_ratio
    x_new = jnp.where(accept[:, None], prop, x)
    lp_new = jnp.where(accept, lp_prop, lp)
    force_new = jnp.where(accept[:, None], force_prop, force)
    return x_new, lp_new, force_new, jnp.mean(accept.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("log_prob_and_force", "num_steps", "adapt", "target_accept"))
def mala_chain(
    log_prob_and_force,
    x0: jnp.ndarray,
    key,
    num_steps: int,
    dt: float = 1e-4,
    adapt: bool = True,
    target_accept: float = 0.574,
):
    """Run ``num_steps`` MALA steps on a batch of chains.

    Returns (x_final, acceptance_rates (num_steps,), dt_final).
    """
    lp0, f0 = log_prob_and_force(x0)

    def body(carry, key_t):
        x, lp, force, dt = carry
        x, lp, force, acc = _mala_step(log_prob_and_force, x, lp, force, dt, key_t)
        if adapt:
            dt = jnp.where(acc > target_accept, dt * 1.02, dt / 1.02)
        return (x, lp, force, dt), acc

    keys = jax.random.split(key, num_steps)
    (x, _, _, dt_f), accs = jax.lax.scan(body, (x0, lp0, f0, jnp.asarray(dt)), keys)
    return x, accs, dt_f


@functools.partial(
    jax.jit, static_argnames=("log_prob_and_force", "num_steps", "n_leapfrog", "adapt")
)
def hmc_chain(
    log_prob_and_force,
    x0: jnp.ndarray,
    key,
    num_steps: int,
    step_size: float = 1e-2,
    n_leapfrog: int = 10,
    adapt: bool = True,
    target_accept: float = 0.65,
):
    """Batched HMC with leapfrog integration (fab hmc.py:9-264 capability)."""
    lp0, _ = log_prob_and_force(x0)

    def leapfrog(x, p, eps):
        _, force = log_prob_and_force(x)
        p = p + 0.5 * eps * force

        def lf_body(i, carry):
            x, p, force = carry
            x = x + eps * p
            _, force = log_prob_and_force(x)
            p = p + eps * force
            return (x, p, force)

        x, p, force = jax.lax.fori_loop(0, n_leapfrog, lf_body, (x, p, force))
        p = p - 0.5 * eps * force  # halve the final kick
        return x, p

    def body(carry, key_t):
        x, lp, eps = carry
        k_mom, k_acc = jax.random.split(key_t)
        p = jax.random.normal(k_mom, x.shape)
        ke0 = 0.5 * jnp.sum(p**2, axis=-1)
        x_new, p_new = leapfrog(x, p, eps)
        lp_new, _ = log_prob_and_force(x_new)
        ke1 = 0.5 * jnp.sum(p_new**2, axis=-1)
        log_ratio = (lp_new - lp) + (ke0 - ke1)
        accept = jnp.log(jax.random.uniform(k_acc, lp.shape)) < log_ratio
        x = jnp.where(accept[:, None], x_new, x)
        lp = jnp.where(accept, lp_new, lp)
        acc = jnp.mean(accept.astype(jnp.float32))
        if adapt:
            eps = jnp.where(acc > target_accept, eps * 1.02, eps / 1.02)
        return (x, lp, eps), acc

    keys = jax.random.split(key, num_steps)
    (x, _, eps_f), accs = jax.lax.scan(body, (x0, lp0, jnp.asarray(step_size)), keys)
    return x, accs, eps_f


def generate_lj_dataset(
    target,
    num_samples: int,
    seed: int = 0,
    warmup: int = 12000,
    thin: int = 10,
    energy_threshold: float = 1e3,
):
    """Generate approximate ground-truth LJ samples by batched adaptive MALA.

    Capability of ``sampling/sample_lj13.py`` (20000 samples, 2000 warmup),
    run entirely on-device. Chains start from a Gaussian cluster relaxed by a
    short Adam energy minimization (overlapping particles would otherwise
    strand chains at astronomic energies that MALA can never leave), then
    adaptive-MALA warmup; any chain still above ``energy_threshold`` after
    warmup is replaced by a healthy one before sampling.
    """
    import itertools

    import optax

    key = jax.random.PRNGKey(seed)
    n_chains = min(num_samples, 512)
    k_init, k_chain, k_fix = jax.random.split(key, 3)
    # jittered-lattice init: guaranteed minimum separation (a Gaussian blob
    # puts particles inside each other's r^-12 cores and neither Adam nor
    # MALA reliably escapes)
    N = target.n_particles
    side = int(np.ceil(N ** (1 / 3)))
    pts = np.array(list(itertools.product(range(side), repeat=3)), np.float32)[:N] * 1.12
    pts -= pts.mean(0)
    x0 = jnp.tile(jnp.asarray(pts.reshape(1, -1)), (n_chains, 1))
    x0 = x0 + jax.random.normal(k_init, x0.shape) * 0.05

    # relax the jittered lattices (batched Adam on the raw energy)
    opt = optax.adam(3e-3)

    @jax.jit
    def relax(x):
        state = opt.init(x)

        def body(carry, _):
            x, state = carry
            g = jax.grad(lambda xx: jnp.sum(target.energy(xx)))(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, state = opt.update(g, state, x)
            return (optax.apply_updates(x, updates), state), None

        (x, _), _ = jax.lax.scan(body, (x, state), None, length=2000)
        return x

    x0 = relax(x0)

    lpf = target.log_prob_and_force
    # warm up in bounded dispatches (very long single scans can trip device
    # watchdogs on tunneled runtimes)
    x, dt = x0, 5e-5
    warm_chunk = 2000
    for w in range(int(np.ceil(warmup / warm_chunk))):
        x, _, dt = mala_chain(
            lpf, x, jax.random.fold_in(k_chain, 1000 + w), warm_chunk, dt=float(dt)
        )

    # replace any still-unhealthy chain by a random healthy one
    lp, _ = lpf(x)
    healthy = jnp.abs(lp) < energy_threshold
    idx_healthy = jnp.nonzero(healthy, size=n_chains, fill_value=0)[0]
    repl = idx_healthy[jax.random.randint(k_fix, (n_chains,), 0, jnp.maximum(jnp.sum(healthy), 1))]
    x = jnp.where(healthy[:, None], x, x[repl])

    rounds = int(np.ceil(num_samples / n_chains))
    out = []
    for r in range(rounds):
        x, _, dt = mala_chain(lpf, x, jax.random.fold_in(k_chain, r + 1), thin * 20, dt=float(dt))
        out.append(np.asarray(x))
    data = np.concatenate(out, axis=0)[:num_samples]
    return data


def split_rhat(chains_stat: np.ndarray) -> float:
    """Split-R̂ of a scalar statistic; chains_stat: (n_chains, n_draws).

    Gelman et al. split-chain potential scale reduction — the convergence
    diagnostic missing from the reference's ground-truth protocol
    (sampling/README.md runs ×10 but never checks agreement)."""
    c = np.asarray(chains_stat, np.float64)
    n = c.shape[1] // 2
    halves = np.concatenate([c[:, :n], c[:, n : 2 * n]], axis=0)  # (2m, n)
    m, n = halves.shape
    means = halves.mean(axis=1)
    W = halves.var(axis=1, ddof=1).mean()
    B = n * means.var(ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return float(np.sqrt(var_plus / max(W, 1e-300)))


def generate_lj_dataset_reference_protocol(
    target,
    num_samples: int = 20000,
    n_runs: int = 10,
    seed: int = 0,
    warmup: int = 12000,
    rhat_tolerance: float = 1.05,
):
    """The reference's ground-truth MCMC protocol, with a convergence check.

    ``sampling/sample_lj13.py`` / ``sample_lj55.py`` draw 20000 samples after
    2000 warmup across ×10 independent runs (sampling/README.md:3-10). Here
    each run is an independently seeded adaptive-MALA ensemble; runs are
    pooled only after the split-R̂ of the per-run energy traces passes
    ``rhat_tolerance``. Returns (samples, diagnostics dict).
    """
    per_run = int(np.ceil(num_samples / n_runs))
    runs = []
    energies = []
    for r in range(n_runs):
        data = generate_lj_dataset(
            target, per_run, seed=seed + 1000 * r, warmup=warmup
        )
        runs.append(data)
        energies.append(np.asarray(target.energy(jnp.asarray(data))))
    e = np.stack(energies)  # (n_runs, per_run)
    rhat = split_rhat(e)
    diag = {
        "rhat_energy": rhat,
        "per_run_energy_mean": [float(m) for m in e.mean(axis=1)],
        "per_run_energy_std": [float(s) for s in e.std(axis=1)],
        "converged": bool(rhat < rhat_tolerance),
    }
    data = np.concatenate(runs, axis=0)[:num_samples]
    if not diag["converged"]:
        print(
            f"WARNING: ground-truth runs disagree (R-hat {rhat:.3f} > "
            f"{rhat_tolerance}); treat the pooled dataset with caution"
        )
    return data, diag
