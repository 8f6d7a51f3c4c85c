version = '03b_pallas_small_blocks';
MY_MMult = [
1024 1.267555e+04 1.435538e-07
];
