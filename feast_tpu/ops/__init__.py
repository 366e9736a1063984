from . import amg, eig, eigh, krylov, lu, qr, qz, sparse, svd
