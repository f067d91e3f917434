

def test_verification_scalar_products_match_bitstring():
    import random

    from curdleproofs_tpu.constants import R
    from curdleproofs_tpu.util import (
        get_verification_scalars_bitstring, verification_scalar_products,
    )

    rnd = random.Random(5)
    for logn in (1, 3, 8):
        n = 1 << logn
        ch = [rnd.randrange(1, R) for _ in range(logn)]
        bitstring = get_verification_scalars_bitstring(n, logn)
        want = []
        for i in range(n):
            s = 1
            for j in bitstring[i]:
                s = s * ch[j] % R
            want.append(s)
        assert verification_scalar_products(ch, n) == want
