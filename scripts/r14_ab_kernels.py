"""Same-session alternating A/B of the r14 fit-kernel rewrites vs
their r13 reference implementations (inlined here verbatim), on the
real sf0.1 largest series.  Window-drift-proof by construction: cells
alternate old/new in one process.

Usage: python scripts/r14_ab_kernels.py [bocpd gp lstm] [--cells N]
"""

from __future__ import annotations

import sys
import time
from math import lgamma, pi

import numpy as np

sys.path.insert(0, "/root/repo")

from r14_profile_fits import load_series, one_series  # noqa: E402


def ab(label: str, old, new, cells: int = 3):
    touts, tolds, tnews = [], [], []
    old(); new()  # warm both paths (JIT/pagecache/BLAS pool)
    for _ in range(cells):
        t0 = time.perf_counter(); old(); tolds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); new(); tnews.append(time.perf_counter() - t0)
    mo, mn = sorted(tolds)[len(tolds) // 2], sorted(tnews)[len(tnews) // 2]
    print(f"{label:32s} old {['%.3f' % t for t in tolds]} new "
          f"{['%.3f' % t for t in tnews]}  median {mo:.3f}->{mn:.3f}s "
          f"({mo / mn:.2f}x)")


# --- r13 BOCPD reference (verbatim loop) -------------------------------
def bocpd_r13(y, hazard_lam=100.0, mu0=0.0, kappa0=1.0, alpha0=1.0,
              beta0=1.0, max_run=500, eps=1e-9, short_run=5):
    n = len(y)
    h = 1.0 / hazard_lam
    r = np.array([1.0]); mu = np.array([mu0]); kappa = np.array([kappa0])
    alpha = np.array([alpha0]); beta = np.array([beta0])
    run_len = np.array([0])
    cp = np.empty(n); short = np.empty(n)
    rl_cap = int(run_len.max()) + n + 2
    grid = alpha0 + np.arange(rl_cap) / 2.0
    lg_den_tab = np.array([lgamma(a) for a in grid])
    lg_num_tab = np.array([lgamma(a + 0.5) for a in grid])
    for t in range(n):
        df = 2 * alpha
        scale = np.sqrt(beta * (kappa + 1) / (alpha * kappa))
        z = (y[t] - mu) / scale
        pred = np.exp(lg_num_tab[run_len] - lg_den_tab[run_len]
                      - 0.5 * np.log(df * pi) - np.log(scale)
                      - (df + 1) / 2 * np.log1p(z * z / df))
        growth = r * pred * (1 - h)
        cp0 = float(np.sum(r * pred * h))
        r_new = np.concatenate([[cp0], growth])
        total = r_new.sum()
        r_new = r_new / total if total > 0 else np.r_[1.0, np.zeros(len(growth))]
        cp[t] = r_new[0]
        rl_new = np.concatenate([[0], run_len + 1])
        short[t] = float(r_new[rl_new <= short_run].sum())
        mu_new = np.concatenate([[mu0], (kappa * mu + y[t]) / (kappa + 1)])
        kappa_new = np.concatenate([[kappa0], kappa + 1])
        alpha_new = np.concatenate([[alpha0], alpha + 0.5])
        beta_new = np.concatenate(
            [[beta0], beta + kappa * (y[t] - mu) ** 2 / (2 * (kappa + 1))])
        keep = r_new > eps
        keep[0] = True
        if keep.sum() > max_run:
            idx = np.argsort(r_new)[::-1][:max_run]
            keep = np.zeros_like(keep)
            keep[idx] = True
            keep[0] = True
        r = r_new[keep]; r = r / r.sum()
        mu, kappa, alpha, beta = (mu_new[keep], kappa_new[keep],
                                  alpha_new[keep], beta_new[keep])
        run_len = rl_new[keep]
    return cp, short


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = set(args) or {"bocpd", "gp", "lstm"}
    cells = 3
    if "--cells" in sys.argv:
        cells = int(sys.argv[sys.argv.index("--cells") + 1])
    g = one_series(load_series())
    y = g["value"].to_numpy(float)
    print(f"series rows={len(y)}")

    if "bocpd" in which:
        from time_series_data_anomaly_detection_spark.functions.bocpd import (
            bocpd_series,
        )
        sd = y.std() or 1.0
        z = (y - y.mean()) / sd
        res_old = bocpd_r13(z)
        res_new = bocpd_series(z)
        assert np.array_equal(res_old[0], res_new[0])
        assert np.array_equal(res_old[1], res_new[1])
        print("# bocpd outputs bit-identical")
        ab("bocpd_series 20k rows", lambda: bocpd_r13(z),
           lambda: bocpd_series(z), cells)

    if "gp" in which:
        from time_series_data_anomaly_detection_spark.functions.gp import (
            _chol_blocked, _kernel, _tri_solve_lower,
        )
        n = len(y)
        n_train = max(int(n * 0.5), 2)
        lo = max(n_train - 1000, 0)
        x_tr = np.arange(lo, n_train, dtype=float)
        y_tr = y[lo:n_train]
        muv, sdv = float(y_tr.mean()), float(y_tr.std()) or 1.0
        yn = (y_tr - muv) / sdv
        K0 = _kernel(x_tr, x_tr, 1.0, 50.0, 24.0, 1.0, 1.0, None)
        K0[np.diag_indices_from(K0)] += 0.01
        x_star = np.arange(0, 2048, dtype=float)
        Ks = _kernel(x_star, x_tr, 1.0, 50.0, 24.0, 1.0, 1.0, None)
        B = np.column_stack([yn, Ks.T])

        def gp_old():
            sol = np.linalg.solve(K0, B)
            mean = Ks @ sol[:, 0]
            var = 2.01 - np.einsum("ij,ji->i", Ks, sol[:, 1:])
            return mean, var

        def gp_new():
            L, dinvs = _chol_blocked(K0)
            W = _tri_solve_lower(L, dinvs, B)
            mean = W[:, 1:].T @ W[:, 0]
            var = 2.01 - np.einsum("ij,ij->j", W[:, 1:], W[:, 1:])
            return mean, var

        mo, vo = gp_old(); mn_, vn = gp_new()
        print(f"# gp mean max abs diff {np.max(np.abs(mo - mn_)):.2e}, "
              f"var max abs diff {np.max(np.abs(vo - vn)):.2e}")
        ab("gp solve+moments m=1000 k=2048", gp_old, gp_new, cells)

    if "lstm" in which:
        from time_series_data_anomaly_detection_spark.functions._lstm_numpy import (
            NumpyLSTM, _sigmoid,
        )

        class RefLSTM(NumpyLSTM):  # the r13 forward/backward, verbatim
            def _forward(self, X, want_cache):
                p, H = self.params, self.H
                B, T, _ = X.shape
                dt = p["Wx"].dtype
                h = np.zeros((B, H), dtype=dt)
                c = np.zeros((B, H), dtype=dt)
                cache = []
                for t in range(T):
                    z = X[:, t, :] @ p["Wx"] + h @ p["Wh"] + p["b"]
                    i = _sigmoid(z[:, :H])
                    f = _sigmoid(z[:, H: 2 * H])
                    gg = np.tanh(z[:, 2 * H: 3 * H])
                    o = _sigmoid(z[:, 3 * H:])
                    c_new = f * c + i * gg
                    tc = np.tanh(c_new)
                    if want_cache:
                        cache.append((X[:, t, :], h, c, i, f, gg, o, c_new, tc))
                    h = o * tc
                    c = c_new
                pred = (h @ p["Wy"] + p["by"]).ravel()
                return pred, h, cache

            def _backward(self, dpred, h_last, cache):
                p = self.params
                g_ = {n: np.zeros_like(v) for n, v in p.items()}
                dp = dpred[:, None]
                g_["Wy"] = h_last.T @ dp
                g_["by"] = dp.sum(axis=0)
                dh = dp @ p["Wy"].T
                dc = np.zeros_like(dh)
                for x_t, h_prev, c_prev, i, f, gg, o, c_new, tc in reversed(cache):
                    do = dh * tc
                    dc = dc + dh * o * (1.0 - tc * tc)
                    di = dc * gg
                    df = dc * c_prev
                    dg = dc * i
                    dz = np.concatenate(
                        [di * i * (1.0 - i), df * f * (1.0 - f),
                         dg * (1.0 - gg * gg), do * o * (1.0 - o)], axis=1)
                    g_["Wx"] += x_t.T @ dz
                    g_["Wh"] += h_prev.T @ dz
                    g_["b"] += dz.sum(axis=0)
                    dh = dz @ p["Wh"].T
                    dc = dc * f
                return g_

        n = len(y)
        mu, sd = float(y.mean()), float(y.std()) or 1.0
        z = (y - mu) / sd
        seq = 48
        X = np.lib.stride_tricks.sliding_window_view(z, seq)[:-1]
        t_ = z[seq:]
        n_train = max(int(n * 0.5), seq + 2)
        hi = n_train - seq
        lo = max(hi - 1500, 0)
        X_tr, y_tr = X[lo:hi, :, None], t_[lo:hi]
        Xall = X[:, :, None]

        def lstm_old():
            m = RefLSTM(24, seed=0)
            m.fit(X_tr, y_tr, epochs=6, batch=96, seed=0, lr=3e-3)
            return m.predict(Xall)

        def lstm_new():
            m = NumpyLSTM(24, seed=0)
            m.fit(X_tr, y_tr, epochs=6, batch=96, seed=0, lr=3e-3)
            return m.predict(Xall)

        po, pn = lstm_old(), lstm_new()
        assert np.array_equal(po, pn), "lstm outputs drifted"
        print("# lstm fit+predict outputs bit-identical")
        ab("lstm fit+predict (h24 e6 w1500)", lstm_old, lstm_new, cells)


if __name__ == "__main__":
    main()
