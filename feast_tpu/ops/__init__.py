from . import eig, eigh, krylov, lu, qr, qz, sparse, svd
