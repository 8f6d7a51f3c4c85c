version = '03_pallas_k_blocked';
MY_MMult = [
1024 2.374138e+04 1.392154e-07
];
