import numpy as np
from scipy.special import dawsn
from scipy.optimize import least_squares

# Fit F(x) ~= x * P(x^2) / Q(x^2), P deg 6 (p0..p6), Q deg 7 monic-ish (q0=1, q1..q7)
# Constraint for x->inf: F ~ 1/(2x)  =>  p6/q7 = 1/2.
# Parameterize: params = p0..p6, q1..q7 ; fix q0=1.
x = np.concatenate([np.linspace(1e-6, 4, 4000), np.geomspace(4, 500, 2000)])
y = dawsn(x)

def model(p, x):
    P = p[0:7]; Q = np.concatenate([[1.0], p[7:14]])
    x2 = x*x
    num = np.polyval(P[::-1], x2)
    den = np.polyval(Q[::-1], x2)
    return x * num / den

def resid(p):
    return (model(p, x) - y) / y   # relative error

# init: Taylor F(x)=x(1 - 2/3 x^2 + 4/15 x^4 ...) -> P/Q pade-ish guess
p0 = np.array([1.0, 0.09, 0.04, 6e-3, 1e-3, 4e-5, 1.5e-5,
               0.75, 0.28, 0.07, 0.011, 1.9e-3, 6e-5, 3e-5])
sol = least_squares(resid, p0, method='lm', max_nfev=20000)
p = sol.x
err = np.abs(resid(p))
print("max rel err:", err.max(), "at x=", x[err.argmax()])
print("P =", list(p[0:7]))
print("Q =", [1.0] + list(p[7:14]))
