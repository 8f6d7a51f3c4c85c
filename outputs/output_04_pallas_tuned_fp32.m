version = '04_pallas_tuned_fp32';
MY_MMult = [
2048 2.918033e+04 1.665813e-07
4096 3.112090e+04 1.673259e-07
];
