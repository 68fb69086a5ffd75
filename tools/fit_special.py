import numpy as np
from scipy.special import erfc
from scipy.optimize import least_squares

# erfc(x) ~= exp(-x^2)/x * poly(1/x^2) on two intervals: [1,2] and [2,11]
def fit(lo, hi, deg, npts=8000):
    x = np.linspace(lo, hi, npts)
    y = erfc(x)
    target = y * x / np.exp(-x*x)    # = poly(1/x^2)
    q = 1.0/(x*x)
    # least squares in relative error of erfc itself
    def model(p): return np.polyval(p[::-1], q)
    def resid(p): return (model(p)*np.exp(-x*x)/x - y)/y
    p0 = np.polyfit(q, target, deg)[::-1]
    sol = least_squares(resid, p0, method='lm', max_nfev=20000)
    e = np.abs(resid(sol.x))
    return sol.x, e.max()

p_mid, e_mid = fit(1.0, 2.0, 8)
p_big, e_big = fit(2.0, 11.0, 7)
print("mid  max rel err:", e_mid)
print("MID =", [float(v) for v in p_mid], " # low->high")
print("big  max rel err:", e_big)
print("BIG =", [float(v) for v in p_big], " # low->high")
