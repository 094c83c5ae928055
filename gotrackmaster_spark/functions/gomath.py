"""Bit-compatible ports of Go's math.{Sin,Cos,Asin,Atan,Atan2,Exp}.

Go's math package uses pure-Go translations of the classic FDLIBM /
Cephes algorithms, which differ from C libm (and hence CPython's math
module) in the final ULP.  The reference's golden fixtures assert exact
float64 equality on values produced through these functions
(``/root/reference/trackmaster/speed_test.go:24-31``), so the Layer-K
scalar kernels use these ports instead of libm.

These are reimplementations of the publicly documented FDLIBM (Sun
Microsystems, freely distributable) and Cephes algorithms as adopted by
the Go standard library — public knowledge, not reference code.

Inputs in this engine are always small (|x| < 2^29), so the large-argument
Payne-Hanek reduction path is unreachable and unimplemented (asserted).
"""

from __future__ import annotations

import math

_PI = math.pi

# --- sin/cos (FDLIBM kernel, Cephes-style Pi/4 split reduction) -------------

_PI4A = 7.85398125648498535156e-01
_PI4B = 3.77489470793079817668e-08
_PI4C = 2.69515142907905952645e-15
_REDUCE_THRESHOLD = float(1 << 29)

_SIN_P = (
    1.58962301576546568060e-10,
    -2.50507477628578072866e-08,
    2.75573136213857245213e-06,
    -1.98412698295895385996e-04,
    8.33333333332211858878e-03,
    -1.66666666666666307295e-01,
)
_COS_P = (
    -1.13585365213876817300e-11,
    2.08757008419747316778e-09,
    -2.75573141792967388112e-07,
    2.48015872888517179954e-05,
    -1.38888888888730564116e-03,
    4.16666666666665929218e-02,
)


def _sin_kernel(z: float, zz: float) -> float:
    p = _SIN_P
    return z + z * zz * (
        ((((p[0] * zz + p[1]) * zz + p[2]) * zz + p[3]) * zz + p[4]) * zz + p[5]
    )


def _cos_kernel(zz: float) -> float:
    p = _COS_P
    return 1.0 - 0.5 * zz + zz * zz * (
        ((((p[0] * zz + p[1]) * zz + p[2]) * zz + p[3]) * zz + p[4]) * zz + p[5]
    )


def go_sin(x: float) -> float:
    if x == 0 or math.isnan(x):
        return x
    if math.isinf(x):
        return math.nan
    sign = False
    if x < 0:
        x = -x
        sign = True
    assert x < _REDUCE_THRESHOLD, "trigReduce path not needed for this engine"
    j = int(x * (4 / _PI))
    y = float(j)
    if j & 1 == 1:
        j += 1
        y += 1
    j &= 7
    z = ((x - y * _PI4A) - y * _PI4B) - y * _PI4C
    if j > 3:
        sign = not sign
        j -= 4
    zz = z * z
    if j == 1 or j == 2:
        y = _cos_kernel(zz)
    else:
        y = _sin_kernel(z, zz)
    return -y if sign else y


def go_cos(x: float) -> float:
    if math.isnan(x) or math.isinf(x):
        return math.nan
    sign = False
    x = abs(x)
    assert x < _REDUCE_THRESHOLD, "trigReduce path not needed for this engine"
    j = int(x * (4 / _PI))
    y = float(j)
    if j & 1 == 1:
        j += 1
        y += 1
    j &= 7
    z = ((x - y * _PI4A) - y * _PI4B) - y * _PI4C
    if j > 3:
        j -= 4
        sign = not sign
    if j > 1:
        sign = not sign
    zz = z * z
    if j == 1 or j == 2:
        y = _sin_kernel(z, zz)
    else:
        y = _cos_kernel(zz)
    return -y if sign else y


# --- atan / atan2 / asin (Cephes) -------------------------------------------

_ATAN_P = (
    -8.750608600031904122785e-01,
    -1.615753718733365076637e01,
    -7.500855792314704667340e01,
    -1.228866684490136173410e02,
    -6.485021904942025371773e01,
)
_ATAN_Q = (
    2.485846490142306297962e01,
    1.650270098316988542046e02,
    4.328810604912902668951e02,
    4.853903996359136964868e02,
    1.945506571482613964425e02,
)
_MOREBITS = 6.123233995736765886130e-17
_TAN3PIO8 = 2.41421356237309504880


def _xatan(x: float) -> float:
    P = _ATAN_P
    Q = _ATAN_Q
    z = x * x
    z = (
        z
        * ((((P[0] * z + P[1]) * z + P[2]) * z + P[3]) * z + P[4])
        / (((((z + Q[0]) * z + Q[1]) * z + Q[2]) * z + Q[3]) * z + Q[4])
    )
    return x * z + x


def _satan(x: float) -> float:
    if x <= 0.66:
        return _xatan(x)
    if x > _TAN3PIO8:
        return _PI / 2 - _xatan(1 / x) + _MOREBITS
    return _PI / 4 + _xatan((x - 1) / (x + 1)) + 0.5 * _MOREBITS


def go_atan(x: float) -> float:
    if x == 0:
        return x
    if x > 0:
        return _satan(x)
    return -_satan(-x)


def go_atan2(y: float, x: float) -> float:
    if math.isnan(y) or math.isnan(x):
        return math.nan
    if y == 0:
        if x >= 0 and not math.copysign(1.0, x) < 0:
            return math.copysign(0, y)
        return math.copysign(_PI, y)
    if x == 0:
        return math.copysign(_PI / 2, y)
    if math.isinf(x):
        if x > 0:
            if math.isinf(y):
                return math.copysign(_PI / 4, y)
            return math.copysign(0, y)
        if math.isinf(y):
            return math.copysign(3 * _PI / 4, y)
        return math.copysign(_PI, y)
    if math.isinf(y):
        return math.copysign(_PI / 2, y)
    q = go_atan(y / x)
    if x < 0:
        if q <= 0:
            return q + _PI
        return q - _PI
    return q


def go_asin(x: float) -> float:
    if x == 0:
        return x
    sign = False
    if x < 0:
        x = -x
        sign = True
    if x > 1:
        return math.nan
    temp = math.sqrt(1 - x * x)
    if x > 0.7:
        temp = _PI / 2 - _satan(temp / x)
    else:
        temp = _satan(x / temp)
    return -temp if sign else temp


# --- exp (FDLIBM) ------------------------------------------------------------

_LN2_HI = 6.93147180369123816490e-01
_LN2_LO = 1.90821492927058770002e-10
_LOG2E = 1.44269504088896338700e00
_EXP_OVERFLOW = 7.09782712893383973096e02
_EXP_UNDERFLOW = -7.45133219101941108420e02
_EXP_NEAR_ZERO = 1.0 / (1 << 28)

_EXP_P1 = 1.66666666666666657415e-01
_EXP_P2 = -2.77777777770155933842e-03
_EXP_P3 = 6.61375632143793436117e-05
_EXP_P4 = -1.65339022054652515390e-06
_EXP_P5 = 4.13813679705723846039e-08


def go_exp(x: float) -> float:
    if math.isnan(x) or (math.isinf(x) and x > 0):
        return x
    if math.isinf(x):
        return 0.0
    if x > _EXP_OVERFLOW:
        return math.inf
    if x < _EXP_UNDERFLOW:
        return 0.0
    if -_EXP_NEAR_ZERO < x < _EXP_NEAR_ZERO:
        return 1 + x
    if x < 0:
        k = int(_LOG2E * x - 0.5)
    else:
        k = int(_LOG2E * x + 0.5)
    hi = x - float(k) * _LN2_HI
    lo = float(k) * _LN2_LO
    r = hi - lo
    t = r * r
    c = r - t * (_EXP_P1 + t * (_EXP_P2 + t * (_EXP_P3 + t * (_EXP_P4 + t * _EXP_P5))))
    y = 1 - ((lo - (r * c) / (2 - c)) - hi)
    return math.ldexp(y, k)
